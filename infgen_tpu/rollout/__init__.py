from infgen_tpu.rollout.closed_loop import make_rollout_fn  # noqa: F401
