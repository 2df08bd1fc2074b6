from .segment import (segment_cumsum, segment_sort, segment_sum,
                      segment_argsort, row_ptr_to_segment_ids,
                      segment_ids_to_row_ptr)
from .coherence import minimize_mutual_coherence, mutual_coherence
