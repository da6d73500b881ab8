from tensoir_tpu.ops.interp import (  # noqa: F401
    bilerp_plane,
    lerp_line,
    trilerp_volume,
    bilerp_image_nchw_like,
    resize_bilinear_align_corners,
)
from tensoir_tpu.ops.compositing import raw2alpha, raw2alpha_from_sigma  # noqa: F401
from tensoir_tpu.ops.rays import (  # noqa: F401
    aabb_ray_tmin,
    aabb_intersect,
    sample_ray,
    sample_ray_equally,
    sample_pdf,
)
from tensoir_tpu.ops.color import linear2srgb, srgb2linear  # noqa: F401
from tensoir_tpu.ops.pe import positional_encoding  # noqa: F401
from tensoir_tpu.ops.brdf import ggx_specular  # noqa: F401
from tensoir_tpu.ops.sh import eval_sh_bases  # noqa: F401
