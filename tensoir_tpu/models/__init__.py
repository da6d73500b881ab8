from tensoir_tpu.models.field import (  # noqa: F401
    FieldConfig,
    init_field_params,
    grid_size_of,
)
