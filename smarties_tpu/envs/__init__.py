from smarties_tpu.envs import cartpole, glider, pendulum, predator_prey
