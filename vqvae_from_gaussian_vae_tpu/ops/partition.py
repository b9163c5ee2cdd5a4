"""Shared helpers for the fused kernels' custom_partitioning annotations.

The resample/conv training ops (upsample_conv.py, downsample_conv.py,
conv3x3_train.py) all shard over the batch dimension of their
logically-(H, W, B, C) operands; this module holds the sharding-spec
probing they have in common so a fix (e.g. multi-axis PartitionSpec
entries) lands once.
"""


def batch_axis_of(arg_info, dim):
    """Mesh axis name sharding `dim` of `arg_info` (None if unsharded).

    `arg_info` is the ShapedArray-like object custom_partitioning passes to
    infer_sharding/partition callbacks; its .sharding.spec may be shorter
    than the operand rank (trailing dims unsharded).
    """
    spec = getattr(getattr(arg_info, "sharding", None), "spec", None)
    if spec is None or len(spec) <= dim:
        return None
    return spec[dim]
