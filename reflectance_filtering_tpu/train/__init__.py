from .description import get_description, parse_description  # noqa: F401
from .loop import TrainState, fit, make_train_step  # noqa: F401
from .checkpoint import Checkpointer, save_checkpoint, load_checkpoint  # noqa: F401
from .monitors import CombineLosses, RunningAverage, ProgressPrinter  # noqa: F401
