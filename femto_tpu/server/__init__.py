from .server import FemtoServer, serve
