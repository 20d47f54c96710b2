"""Real-text corpora for probes and bench: genuine UNIQUE English prose
assembled from installed-package docstrings + pydoc topics (~27 MiB
available in this image).  Repetition-free by construction (text-hash
dedup) — a repeated corpus inflates BWT run lengths and overstates
compression (the round-5 probe bug this module fixes: pydoc topics alone
are 0.49 MiB, and tiling them 16x measured 0.52 B/char where honest
prose measures ~0.9)."""
import hashlib
import inspect
import warnings


def english_prose(max_mb: float = 16.0) -> bytes:
    """Up to max_mb MiB of unique English technical prose."""
    warnings.filterwarnings("ignore")
    budget = int(max_mb * (1 << 20))
    parts = []
    total = 0
    seen = set()

    def add(text: str) -> bool:
        nonlocal total
        b = text.encode("utf-8", "replace")
        h = hashlib.blake2b(b, digest_size=12).digest()
        if h in seen or len(b) < 200:
            return total < budget
        seen.add(h)
        parts.append(b)
        total += len(b) + 1
        return total < budget

    import pydoc_data.topics as topics
    for k in sorted(topics.topics):
        if not add(topics.topics[k]):
            return b"\n".join(parts)[:budget]

    for pkg in ("numpy", "scipy", "pandas", "sklearn", "torch"):
        try:
            import importlib

            m = importlib.import_module(pkg)
        except Exception:
            continue
        seen_ids = set()
        stack = [m]
        while stack:
            obj = stack.pop()
            if id(obj) in seen_ids:
                continue
            seen_ids.add(id(obj))
            try:
                d = inspect.getdoc(obj)
            except Exception:
                d = None
            if d and not add(d):
                return b"\n".join(parts)[:budget]
            if inspect.ismodule(obj) and getattr(
                    obj, "__name__", "").startswith(pkg):
                for name in dir(obj):
                    try:
                        stack.append(getattr(obj, name))
                    except Exception:
                        pass
            elif inspect.isclass(obj):
                for name in dir(obj):
                    try:
                        a = getattr(obj, name)
                        if callable(a):
                            stack.append(a)
                    except Exception:
                        pass
    return b"\n".join(parts)[:budget]


if __name__ == "__main__":
    b = english_prose(32)
    print(f"{len(b)/2**20:.2f} MiB unique prose")
