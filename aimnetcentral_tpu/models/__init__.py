from aimnetcentral_tpu.models.aimnet2 import (  # noqa: F401
    AEVConfig,
    AIMNet2Config,
    aimnet2_apply,
    aimnet2_init,
)
