from .rank import occ, occ2, bwt_at, lf_step
from .search_ops import (
    backward_search,
    backward_search_steps,
    locate_rows,
    locate_rows_phased,
    extract_backward,
    psi_step,
)
