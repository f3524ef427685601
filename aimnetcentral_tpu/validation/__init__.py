from aimnetcentral_tpu.validation.observables import (  # noqa: F401
    compare_observables,
    dump_observables,
    reference_systems,
)
