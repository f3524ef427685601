from aimnetcentral_tpu.dynamics.md import MDConfig, MDDriver  # noqa: F401
from aimnetcentral_tpu.dynamics.neb import linear_band, neb, neb_core  # noqa: F401
from aimnetcentral_tpu.dynamics.optimize import fire_relax  # noqa: F401
from aimnetcentral_tpu.dynamics.saddle import min_mode_search, ts_search  # noqa: F401
from aimnetcentral_tpu.dynamics.trajectory import (  # noqa: F401
    TrajectoryWriter,
    read_frames,
)
from aimnetcentral_tpu.dynamics.vibrations import (  # noqa: F401
    frequencies_from_calculator,
    harmonic_frequencies,
)
