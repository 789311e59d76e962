from smarties_tpu.envs import cartpole, pendulum, predator_prey
