from .editops import (
    GAP_A,
    GAP_B,
    MATCH,
    MISMATCH,
    Alignment,
    first_match_pos,
    last_match_pos,
)
from .bsw_ref import bsw_align as bsw_align_ref
