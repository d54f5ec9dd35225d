"""PML miners (1.6.3 semantics): forward() runs mine() under no_grad."""
import torch

from ..distances import LpDistance
from ..utils import common_functions as c_f


class BaseMiner(torch.nn.Module):
    def __init__(self, collect_stats=False, distance=None, **kwargs):
        super().__init__()
        self.collect_stats = collect_stats
        self.distance = distance if distance is not None else self.get_default_distance()

    def get_default_distance(self):
        return LpDistance(p=2)

    def reset_stats(self):
        pass

    def add_to_recordable_attributes(self, *args, **kwargs):
        pass

    def forward(self, embeddings, labels, ref_emb=None, ref_labels=None):
        self.reset_stats()
        with torch.no_grad():
            labels = c_f.to_device(labels, embeddings)
            if ref_emb is None:
                ref_emb, ref_labels = embeddings, labels
            mining_output = self.mine(embeddings, labels, ref_emb, ref_labels)
        return mining_output

    def mine(self, embeddings, labels, ref_emb, ref_labels):
        raise NotImplementedError


class TripletMarginMiner(BaseMiner):
    def __init__(self, margin=0.2, type_of_triplets="all", **kwargs):
        super().__init__(**kwargs)
        self.margin = margin
        self.type_of_triplets = type_of_triplets
