from aimnetcentral_tpu.train.loss import LossConfig, MTLoss  # noqa: F401
from aimnetcentral_tpu.train.step import TrainState, make_train_step  # noqa: F401
