from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator  # noqa: F401
