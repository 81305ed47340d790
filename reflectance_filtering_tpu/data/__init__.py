from .builder import (  # noqa: F401
    build_dataset, comparisons_to_matrix, get_data_for_single_file,
    narihira_split_three, narihira_split_two, big_train_mini_val_split,
    augment, unify, warshall, consolidate,
    MAX_NUM_COMPARISONS, MAX_NUM_AUGMENTED,
)
from .loader import get_data  # noqa: F401
