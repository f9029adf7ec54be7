from sed_tpu.train.state import SedTrainState, create_train_state
from sed_tpu.train.step import make_train_step, make_eval_step
