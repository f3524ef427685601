from aimnetcentral_tpu.kernels.conv_stencil import (  # noqa: F401
    PALLAS_CONV_ENABLED,
    conv_stencil_available,
)
