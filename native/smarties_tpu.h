// smarties_tpu native client library.
//
// C++/C/Fortran-facing Communicator for external environment applications
// (the reference exposes the same surface through include/smarties.h +
// smarties_extern.cpp + include/smarties.f90). Apps own the control flow
// and call send_*_state / recv_action; the learner lives in the python/JAX
// process and serves actions over a UNIX-domain socket whose path arrives
// in the SMARTIES_TPU_SOCKET environment variable.
//
// Wire protocol (little-endian, this library's own — NOT the reference's):
//   spec:   u32 'SPEC' | u32 len | json bytes
//   state:  u32 'STAT' | u32 agent | u32 status | u32 dimS |
//           f64 state[dimS] | f64 reward
//   action: u32 'ACTN' | u32 dimA | f64 action[dimA]
//   kill:   u32 'KILL'
#ifndef SMARTIES_TPU_NATIVE_H
#define SMARTIES_TPU_NATIVE_H

#ifdef __cplusplus
#include <cstdint>
#include <stdexcept>
#include <string>
#include <vector>

namespace smarties_tpu {

struct TrainingTerminated : public std::runtime_error {
  TrainingTerminated() : std::runtime_error("training terminated") {}
};

enum Status : uint32_t { INIT = 0, CONT = 1, TERM = 2, LAST = 3 };

class Communicator {
 public:
  // Connects to the learner socket (SMARTIES_TPU_SOCKET env var, or an
  // explicit path).
  explicit Communicator(const char* socket_path = nullptr);
  ~Communicator();

  // ---- problem description (must precede the first sendInitState) ----
  void set_state_action_dims(int dim_state, int dim_action);
  void set_action_scales(const std::vector<double>& upper,
                         const std::vector<double>& lower,
                         bool are_bounds = true);
  void set_action_options(const std::vector<int>& options_per_dim);
  void set_action_options(int options);
  void set_state_observable(const std::vector<bool>& observable);
  void set_num_agents(int n_agents);
  void set_num_appended_past_observations(int n);
  void set_preprocessing_conv2d(int in_w, int in_h, int in_c, int out_c,
                                int filter, int stride);

  // ---- env teams (multi-process simulations; MPI apps) ----
  // Declares this process as rank `rank` of an `nranks`-process team
  // simulating environment `env_id` (an MPI app passes its own
  // MPI_Comm_rank/size). Each rank opens its OWN socket; the learner
  // groups them by (env_id, rank). Defaults come from the
  // SMARTIES_TPU_ENV_ID / SMARTIES_TPU_TEAM_RANK /
  // SMARTIES_TPU_TEAM_SIZE environment variables (set by the learner's
  // launcher), so apps spawned by SocketEnvPool need not call this.
  // Reference analog: the environment_app_comm team
  // (ExecutionInfo.cpp:315-332, Engine::setNworkersPerEnvironment).
  void set_team(int env_id, int rank, int nranks);
  // The SAME logical agents span every rank of the team: all ranks send
  // identical states, only rank 0's are ingested, and every rank
  // receives the same action reply — the action MPI_Bcast over
  // environment_app_comm done by the library instead of the app
  // (reference Core/Worker.cpp:371-383).
  void env_has_distributed_agents();

  // ---- episode flow ----
  void send_init_state(const std::vector<double>& state, int agent = 0);
  void send_state(const std::vector<double>& state, double reward,
                  int agent = 0);
  void send_term_state(const std::vector<double>& state, double reward,
                       int agent = 0);
  void send_last_state(const std::vector<double>& state, double reward,
                       int agent = 0);
  // Blocks until the learner replies; throws TrainingTerminated on KILL.
  std::vector<double> recv_action(int agent = 0);
  int recv_discrete_action(int agent = 0);

 private:
  void send_spec_once();
  void send_state_msg(uint32_t status, const std::vector<double>& state,
                      double reward, int agent);
  void write_all(const void* buf, size_t n);
  void read_all(void* buf, size_t n);

  int fd_ = -1;
  bool spec_sent_ = false;
  bool team_set_ = false;
  std::string spec_json_;
  int dim_state_ = -1, dim_action_ = -1;
  std::string spec_fields_;  // accumulated json fields
  std::string conv_json_;    // accumulated conv layer descriptors
};

}  // namespace smarties_tpu

extern "C" {
#endif  // __cplusplus

// ---- flat C API (reference analog: smarties_extern.cpp) ----
// All functions operate on an opaque handle created by smarties_tpu_create.
void* smarties_tpu_create(const char* socket_path);
void smarties_tpu_destroy(void* comm);
void smarties_tpu_set_state_action_dims(void* comm, int dim_state,
                                        int dim_action);
void smarties_tpu_set_action_scales(void* comm, const double* upper,
                                    const double* lower, int are_bounds,
                                    int dim);
void smarties_tpu_set_action_options(void* comm, const int* options,
                                     int dim);
void smarties_tpu_set_state_observable(void* comm, const int* observable,
                                       int dim);
void smarties_tpu_set_num_agents(void* comm, int n_agents);
void smarties_tpu_set_team(void* comm, int env_id, int rank, int nranks);
void smarties_tpu_env_has_distributed_agents(void* comm);
void smarties_tpu_send_init_state(void* comm, const double* state, int dim,
                                  int agent);
void smarties_tpu_send_state(void* comm, const double* state, int dim,
                             double reward, int agent);
void smarties_tpu_send_term_state(void* comm, const double* state, int dim,
                                  double reward, int agent);
void smarties_tpu_send_last_state(void* comm, const double* state, int dim,
                                  double reward, int agent);
// Returns 0 on success, 1 if training terminated (app should exit).
int smarties_tpu_recv_action(void* comm, double* action, int dim,
                             int agent);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // SMARTIES_TPU_NATIVE_H
