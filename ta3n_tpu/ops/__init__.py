from ta3n_tpu.ops.grl import grad_reverse, grad_scale
from ta3n_tpu.ops.relation import (build_relation_plan, even_subsample_indices,
                                   relation_scales, relation_set,
                                   selected_relation_indices)

__all__ = [
    "grad_reverse",
    "grad_scale",
    "build_relation_plan",
    "even_subsample_indices",
    "relation_scales",
    "relation_set",
    "selected_relation_indices",
]
