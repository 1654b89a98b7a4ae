from freerl_tpu.ops.sumtree_pallas import sumtree_descend, sumtree_descend_xla

__all__ = ["sumtree_descend", "sumtree_descend_xla"]
