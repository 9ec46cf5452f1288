from mtasr_tpu.train.freeze import trainable_mask, freeze_summary
from mtasr_tpu.train.optimizer import make_optimizer, linear_warmup_schedule
from mtasr_tpu.train.train_step import make_train_step, make_eval_step
