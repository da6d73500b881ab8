from tensoir_tpu.render.primary import render_rays  # noqa: F401
from tensoir_tpu.render.brdf_render import render_with_brdf  # noqa: F401
from tensoir_tpu.render.secondary import (  # noqa: F401
    compute_radiance,
    compute_transmittance,
)
