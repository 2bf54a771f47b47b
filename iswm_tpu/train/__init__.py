from .best_score import initialize_best_score, is_best_score, update_best_score
from .checkpoint import best_checkpoint_name, find_best, restore, save_best
from .logging import MetricsLogger, try_setup_mlflow
from .optim import make_optimizer, make_schedule
from .step import TrainState, create_train_state, make_eval_step, make_train_step
from .trainer import Trainer, save_validation_results

__all__ = [
    "MetricsLogger",
    "TrainState",
    "Trainer",
    "best_checkpoint_name",
    "create_train_state",
    "find_best",
    "initialize_best_score",
    "is_best_score",
    "make_eval_step",
    "make_optimizer",
    "make_schedule",
    "make_train_step",
    "restore",
    "save_best",
    "save_validation_results",
    "try_setup_mlflow",
    "update_best_score",
]
