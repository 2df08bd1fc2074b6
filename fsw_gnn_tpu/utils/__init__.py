from .cache import enable_compilation_cache
from .dsmetric import dsmetric
from .validate import (validate_multiset_inputs, validate_edge_index,
                       validate_graph, checkify_embed)
