from snvc_tpu.training.train import TrainState, create_train_state, make_train_step
