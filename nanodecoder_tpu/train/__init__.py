"""Training runtime: loss, optimizers, trainer loop, checkpointing, data.

Reference analog: onmt/trainer.py, onmt/train_single.py, onmt/utils/
loss.py, optimizers.py, onmt/models/model_saver.py (SURVEY.md §2.1,
§3.1).  Re-designed TPU-first: one jitted train step (forward + loss +
backward + optax update) with gradient accumulation folded in via
lax.scan over micro-batches; data parallelism is a sharding annotation,
not a process topology.
"""

from nanodecoder_tpu.train.loss import label_smoothed_nll, loss_and_metrics  # noqa: F401
from nanodecoder_tpu.train.optim import build_optimizer, noam_schedule  # noqa: F401
from nanodecoder_tpu.train.trainer import Trainer, TrainState, make_train_step  # noqa: F401
from nanodecoder_tpu.train.checkpoint import CheckpointManager  # noqa: F401
