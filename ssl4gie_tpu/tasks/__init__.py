from ssl4gie_tpu.tasks.build import build_trainer  # noqa: F401
