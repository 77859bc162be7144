from univs_tpu.ops.position_encoding import (
    SinePositionEncoding3D,
    sine_pe_1d,
)
from univs_tpu.ops.deformable_attention import (
    ms_deform_attn,
    ms_deform_attn_reference,
)
from univs_tpu.ops import mask_ops
