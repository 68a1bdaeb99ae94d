from .optimizer import bert_adam, warmup_linear
from .train_step import make_train_step, init_train_state
