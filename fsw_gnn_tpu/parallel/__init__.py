from .partition import (GraphShards, partition_graph, shard_node_features,
                        shard_recipient_labels, unshard_recipient_values)
from .dist import (make_graph_mesh, make_distributed_train_step,
                   make_distributed_forward, masked_softmax_cross_entropy)
from .dp import make_data_mesh, make_dp_train_step, stack_batches
from .runtime import ensure_distributed, global_mesh
