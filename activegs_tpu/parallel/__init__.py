from .sharded import (  # noqa: F401
    make_hybrid_view_mesh,
    make_view_mesh,
    sharded_candidate_utility,
    sharded_train_step,
    sharded_view_bins,
)
