from aimnetcentral_tpu.dynamics.md import MDConfig, MDDriver  # noqa: F401
from aimnetcentral_tpu.dynamics.optimize import fire_relax  # noqa: F401
