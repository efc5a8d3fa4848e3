from dqc_tpu.ops.pallas.dual_apply import dual_group_apply_planes

__all__ = ["dual_group_apply_planes"]
