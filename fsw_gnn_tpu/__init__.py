"""fsw_gnn_tpu -- TPU-native Fourier Sliced-Wasserstein GNN framework.

A from-scratch JAX/XLA/Pallas implementation of the FSW model family
(FSW embedding for multisets/measures/graph neighborhoods, FSW_conv /
FSW_readout GNN layers) with the capabilities of the PyTorch/CUDA reference
tal-amir/fsw-gnn, redesigned for TPU: static CSR-segment graph layout,
segmented sort/scan primitives, shard_map edge partitioning for pod slices.
"""

from .embedding import (FSWConfig, fsw_embed_multiset, fsw_embed_graph,
                        fsw_embed_graph_batched, fsw_embed_graph_dense,
                        fsw_embed_multi_table, fsw_embed_table, lowclamp)
from .graph import (Graph, MultiTable, NeighborTable, auto_layout,
                    from_edge_index, readout_graph, stack_graphs,
                    to_multi_table, to_neighbor_table)
from .params import generate_params, generate_freqs, generate_proj_vecs
from .ops.coherence import minimize_mutual_coherence, mutual_coherence
from .ops.segment import (segment_cumsum, segment_sort, segment_sum,
                          segment_argsort)
from .modules import FSWEmbedding
from .conv import FSWConv, FSWReadout
from .models import FSWGNN, FSWGraphClassifier
from .utils import dsmetric

__version__ = '0.1.0'
