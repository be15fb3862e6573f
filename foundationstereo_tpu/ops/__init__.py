from foundationstereo_tpu.ops.resize import resize2d, resize1d_matrix  # noqa: F401
from foundationstereo_tpu.ops.pad import InputPadder  # noqa: F401
from foundationstereo_tpu.ops.sampler import gather_1d_lerp, disparity_lookup  # noqa: F401
from foundationstereo_tpu.ops.cost_volume import (  # noqa: F401
    build_gwc_volume,
    build_concat_volume,
    all_pairs_correlation,
    group_normalize,
)
from foundationstereo_tpu.ops.upsample import (  # noqa: F401
    context_upsample,
    disparity_regression,
    avg_pool2d,
    unfold3x3,
)
