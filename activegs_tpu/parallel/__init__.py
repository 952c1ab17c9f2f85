from .sharded import (  # noqa: F401
    make_view_mesh,
    sharded_train_step,
    sharded_candidate_utility,
)
