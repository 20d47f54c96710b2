"""femto_tpu: a TPU-native compressed-text-indexing and search framework.

Capabilities of femto-dev/femto (FM-index construction + count/locate/
document/regex/approximate/Boolean queries), re-architected for TPU:
suffix sort and BWT as XLA sort/scan passes, rank/Occ as batched
segment-checkpoint lookups (with Pallas kernels on the hot path), queries as
lockstep batched scans, and multi-chip scaling via jax.sharding meshes with
ICI collectives in place of MPI pipes.
"""

from .alphabet import (
    ALPHA_SIZE,
    CHARACTER_OFFSET,
    PreparedText,
    prepare_documents,
)
from .fmindex import FMArrays, FMIndex, FMMeta, build_index
from .suffix import suffix_array, bwt_from_sa
from .search import (
    count,
    count_ranges,
    extract_context,
    extract_document,
    locate,
    locate_range,
    offsets_to_docs,
)

__version__ = "0.1.0"
