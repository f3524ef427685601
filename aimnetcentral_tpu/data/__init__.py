from aimnetcentral_tpu.data.sgdataset import (  # noqa: F401
    DataGroup,
    SizeGroupedDataset,
    SizeGroupedSampler,
)
