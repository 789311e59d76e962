from smarties_tpu.envs import cartpole, predator_prey
