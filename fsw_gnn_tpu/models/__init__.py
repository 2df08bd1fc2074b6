from .gnn import FSWGNN, FSWGraphClassifier
