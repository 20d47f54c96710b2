from .mesh import make_mesh, DEFAULT_AXIS
from .dist_sort import dist_sort
from .dist_build import dist_suffix_array, build_index_sharded
from .dist_query import sharded_backward_search, sharded_locate
