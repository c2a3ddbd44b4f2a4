from vmrframe_tpu.train.optim import build_optimizer, linear_warmup_decay
from vmrframe_tpu.train.trainer import Trainer, TrainState
