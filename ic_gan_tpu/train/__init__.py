from ic_gan_tpu.train import losses, state, step, stylegan2_step, trainer
from ic_gan_tpu.train.state import GANTrainState
from ic_gan_tpu.train.step import TrainConfig, make_train_step
from ic_gan_tpu.train.trainer import Trainer, TrainerConfig

__all__ = ["losses", "state", "step", "stylegan2_step", "trainer",
           "GANTrainState", "TrainConfig", "make_train_step", "Trainer",
           "TrainerConfig"]
