from smarties_tpu.envs import (acrobot, cartpole, catch, glider,
                               mountaincar, pendulum, predator_prey)
