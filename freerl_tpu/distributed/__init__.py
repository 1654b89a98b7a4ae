from freerl_tpu.distributed.dp import make_mesh, dp_env_learner_step

__all__ = ["make_mesh", "dp_env_learner_step"]
