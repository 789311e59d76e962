// Distributed-AGENT cart-pole demo in C++: an M-process simulation team
// where the SAME logical agent spans every rank (the shape of an MPI
// simulation whose domain is partitioned across ranks). Every rank
// integrates the full cart-pole deterministically from a shared seed,
// sends identical states, and receives the identical action reply that
// the learner broadcasts to the whole team.
//
// Reference analog: apps/cart_pole_distribAgent (python) and the action
// MPI_Bcast over environment_app_comm (Core/Worker.cpp:371-383). A real
// MPI app would call comm.set_team(env, MPI_rank, MPI_size) itself; here
// the team identity comes from the SMARTIES_TPU_* env vars set by the
// learner-side SocketEnvPool.
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

#include "../../native/smarties_tpu.h"

struct CartPole {
  static constexpr double dt = 0.02;
  double u[4] = {0, 0, 0, 0};
  int step_id = 0;
  std::mt19937 gen;

  explicit CartPole(unsigned seed) : gen(seed) {}

  void reset() {
    std::uniform_real_distribution<double> d(-0.05, 0.05);
    for (double& x : u) x = d(gen);
    step_id = 0;
  }
  bool failed() const {
    return std::fabs(u[0]) > 2.4 || std::fabs(u[2]) > M_PI / 15;
  }
  static void deriv(const double* y, double F, double* dy) {
    const double mp = 0.1, mc = 1.0, l = 0.5, g = 9.81;
    const double cosy = std::cos(y[2]), siny = std::sin(y[2]);
    const double tot = mp + mc;
    const double fac2 = l * (4.0 / 3.0 - mp * cosy * cosy / tot);
    const double f1 = F + mp * l * y[3] * y[3] * siny;
    const double wdot = (g * siny - f1 * cosy / tot) / fac2;
    const double vdot = (f1 - mp * l * wdot * cosy) / tot;
    dy[0] = y[1]; dy[1] = vdot; dy[2] = y[3]; dy[3] = wdot;
  }
  bool advance(double F) {
    const double h = dt / 4;
    for (int s = 0; s < 4; ++s) {
      double k1[4], k2[4], k3[4], k4[4], tmp[4];
      deriv(u, F, k1);
      for (int i = 0; i < 4; ++i) tmp[i] = u[i] + h / 2 * k1[i];
      deriv(tmp, F, k2);
      for (int i = 0; i < 4; ++i) tmp[i] = u[i] + h / 2 * k2[i];
      deriv(tmp, F, k3);
      for (int i = 0; i < 4; ++i) tmp[i] = u[i] + h * k3[i];
      deriv(tmp, F, k4);
      for (int i = 0; i < 4; ++i)
        u[i] += h / 6 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
    }
    ++step_id;
    return step_id >= 500 || failed();
  }
  std::vector<double> state() const {
    return {u[0], u[1], u[2], u[3], std::cos(u[2]), std::sin(u[2])};
  }
  double reward() const { return failed() ? 0.0 : 1.0; }
};

int main() {
  try {
    smarties_tpu::Communicator comm;
    comm.set_state_action_dims(6, 1);
    comm.set_action_scales({10.0}, {-10.0}, true);
    comm.set_state_observable({true, true, false, true, true, true});
    // the same logical agent spans the whole team (set_team identity
    // arrives via SMARTIES_TPU_* env vars; an MPI app would call
    // comm.set_team(env, rank, nranks) here instead)
    comm.env_has_distributed_agents();

    // deterministic from the ENV id only — every rank of the team
    // integrates the identical trajectory (rank must NOT enter the seed)
    const char* te = std::getenv("SMARTIES_TPU_ENV_ID");
    CartPole env(te ? 1234u + std::atoi(te) : 1234u);
    while (true) {
      env.reset();
      comm.send_init_state(env.state());
      while (true) {
        const auto action = comm.recv_action();
        const bool done = env.advance(action[0]);
        if (done && env.failed()) {
          comm.send_term_state(env.state(), env.reward());
          break;
        } else if (done) {
          comm.send_last_state(env.state(), env.reward());
          break;
        } else {
          comm.send_state(env.state(), env.reward());
        }
      }
    }
  } catch (smarties_tpu::TrainingTerminated&) {
    return 0;
  } catch (std::exception& e) {
    std::fprintf(stderr, "cart_pole_distribAgent: %s\n", e.what());
    return 1;
  }
  return 0;
}
