// smarties_tpu native client implementation. See smarties_tpu.h.
#include "smarties_tpu.h"

#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <cerrno>
#include <cstdlib>
#include <cstring>
#include <sstream>

namespace smarties_tpu {

static constexpr uint32_t MAGIC_SPEC = 0x43455053;  // 'SPEC'
static constexpr uint32_t MAGIC_STAT = 0x54415453;  // 'STAT'
static constexpr uint32_t MAGIC_ACTN = 0x4E544341;  // 'ACTN'
static constexpr uint32_t MAGIC_KILL = 0x4C4C494B;  // 'KILL'

Communicator::Communicator(const char* socket_path) {
  const char* path = socket_path ? socket_path
                                 : std::getenv("SMARTIES_TPU_SOCKET");
  if (!path)
    throw std::runtime_error(
        "SMARTIES_TPU_SOCKET not set and no socket path given");
  fd_ = ::socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd_ < 0) throw std::runtime_error("socket() failed");
  sockaddr_un addr;
  std::memset(&addr, 0, sizeof(addr));
  addr.sun_family = AF_UNIX;
  std::strncpy(addr.sun_path, path, sizeof(addr.sun_path) - 1);
  // the learner may still be starting: retry for up to ~30 s
  int rc = -1;
  for (int attempt = 0; attempt < 300; ++attempt) {
    rc = ::connect(fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr));
    if (rc == 0) break;
    ::usleep(100000);
  }
  if (rc != 0) throw std::runtime_error("cannot connect to learner socket");
}

Communicator::~Communicator() {
  if (fd_ >= 0) ::close(fd_);
}

void Communicator::write_all(const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t w = ::write(fd_, p, n);
    if (w < 0) {
      if (errno == EINTR) continue;
      throw std::runtime_error("socket write failed");
    }
    p += w;
    n -= static_cast<size_t>(w);
  }
}

void Communicator::read_all(void* buf, size_t n) {
  char* p = static_cast<char*>(buf);
  while (n > 0) {
    ssize_t r = ::read(fd_, p, n);
    if (r < 0) {
      if (errno == EINTR) continue;
      throw std::runtime_error("socket read failed");
    }
    if (r == 0) throw TrainingTerminated();
    p += r;
    n -= static_cast<size_t>(r);
  }
}

// ---- spec accumulation: emitted as a tiny json object --------------------
static std::string json_list(const std::vector<double>& v) {
  std::ostringstream os;
  os << "[";
  for (size_t i = 0; i < v.size(); ++i) os << (i ? "," : "") << v[i];
  os << "]";
  return os.str();
}
static std::string json_list(const std::vector<int>& v) {
  std::ostringstream os;
  os << "[";
  for (size_t i = 0; i < v.size(); ++i) os << (i ? "," : "") << v[i];
  os << "]";
  return os.str();
}
static std::string json_bool_list(const std::vector<bool>& v) {
  std::ostringstream os;
  os << "[";
  for (size_t i = 0; i < v.size(); ++i)
    os << (i ? "," : "") << (v[i] ? "true" : "false");
  os << "]";
  return os.str();
}

void Communicator::set_state_action_dims(int dim_state, int dim_action) {
  dim_state_ = dim_state;
  dim_action_ = dim_action;
  std::ostringstream os;
  os << "\"dim_state\":" << dim_state << ",\"dim_action\":" << dim_action;
  spec_fields_ += (spec_fields_.empty() ? "" : ",") + os.str();
}

void Communicator::set_action_scales(const std::vector<double>& upper,
                                     const std::vector<double>& lower,
                                     bool are_bounds) {
  std::ostringstream os;
  os << "\"upper\":" << json_list(upper) << ",\"lower\":" << json_list(lower)
     << ",\"bounded\":[";
  for (size_t i = 0; i < upper.size(); ++i)
    os << (i ? "," : "") << (are_bounds ? "true" : "false");
  os << "]";
  spec_fields_ += (spec_fields_.empty() ? "" : ",") + os.str();
}

void Communicator::set_action_options(const std::vector<int>& options) {
  spec_fields_ += (spec_fields_.empty() ? "" : ",") +
                  ("\"discrete_values\":" + json_list(options));
}

void Communicator::set_action_options(int options) {
  set_action_options(std::vector<int>{options});
}

void Communicator::set_state_observable(const std::vector<bool>& obs) {
  spec_fields_ += (spec_fields_.empty() ? "" : ",") +
                  ("\"observable\":" + json_bool_list(obs));
}

void Communicator::set_num_agents(int n) {
  std::ostringstream os;
  os << "\"n_agents\":" << n;
  spec_fields_ += (spec_fields_.empty() ? "" : ",") + os.str();
}

void Communicator::set_num_appended_past_observations(int n) {
  std::ostringstream os;
  os << "\"n_appended_obs\":" << n;
  spec_fields_ += (spec_fields_.empty() ? "" : ",") + os.str();
}

void Communicator::set_team(int env_id, int rank, int nranks) {
  std::ostringstream os;
  os << "\"env_id\":" << env_id << ",\"team_rank\":" << rank
     << ",\"team_size\":" << nranks;
  spec_fields_ += (spec_fields_.empty() ? "" : ",") + os.str();
  team_set_ = true;
}

void Communicator::env_has_distributed_agents() {
  spec_fields_ += (spec_fields_.empty() ? "" : ",") +
                  std::string("\"distributed_agents\":true");
}

void Communicator::set_preprocessing_conv2d(int in_w, int in_h, int in_c,
                                            int out_c, int filter,
                                            int stride) {
  std::ostringstream os;
  os << "[" << in_w << "," << in_h << "," << in_c << "," << out_c << ","
     << filter << "," << stride << "]";
  conv_json_ += (conv_json_.empty() ? "" : ",") + os.str();
}

void Communicator::send_spec_once() {
  if (spec_sent_) return;
  // launcher-provided team identity (SocketEnvPool sets these when
  // spawning workers_per_env > 1 teams; an MPI app may instead call
  // set_team with its own MPI rank/size)
  if (!team_set_) {
    const char* ts = std::getenv("SMARTIES_TPU_TEAM_SIZE");
    if (ts) {
      const char* tr = std::getenv("SMARTIES_TPU_TEAM_RANK");
      const char* te = std::getenv("SMARTIES_TPU_ENV_ID");
      set_team(te ? std::atoi(te) : 0, tr ? std::atoi(tr) : 0,
               std::atoi(ts));
    }
  }
  std::string fields = spec_fields_;
  if (!conv_json_.empty())
    fields += (fields.empty() ? "" : ",") +
              ("\"conv_layers\":[" + conv_json_ + "]");
  spec_json_ = "{" + fields + "}";
  uint32_t hdr[2] = {MAGIC_SPEC,
                     static_cast<uint32_t>(spec_json_.size())};
  write_all(hdr, sizeof(hdr));
  write_all(spec_json_.data(), spec_json_.size());
  spec_sent_ = true;
}

void Communicator::send_state_msg(uint32_t status,
                                  const std::vector<double>& state,
                                  double reward, int agent) {
  send_spec_once();
  uint32_t hdr[4] = {MAGIC_STAT, static_cast<uint32_t>(agent), status,
                     static_cast<uint32_t>(state.size())};
  write_all(hdr, sizeof(hdr));
  write_all(state.data(), state.size() * sizeof(double));
  write_all(&reward, sizeof(double));
}

void Communicator::send_init_state(const std::vector<double>& s, int a) {
  send_state_msg(INIT, s, 0.0, a);
}
void Communicator::send_state(const std::vector<double>& s, double r,
                              int a) {
  send_state_msg(CONT, s, r, a);
}
void Communicator::send_term_state(const std::vector<double>& s, double r,
                                   int a) {
  send_state_msg(TERM, s, r, a);
}
void Communicator::send_last_state(const std::vector<double>& s, double r,
                                   int a) {
  send_state_msg(LAST, s, r, a);
}

std::vector<double> Communicator::recv_action(int /*agent*/) {
  uint32_t magic = 0;
  read_all(&magic, sizeof(magic));
  if (magic == MAGIC_KILL) throw TrainingTerminated();
  if (magic != MAGIC_ACTN)
    throw std::runtime_error("protocol error: bad action magic");
  uint32_t dim = 0;
  read_all(&dim, sizeof(dim));
  std::vector<double> action(dim);
  read_all(action.data(), dim * sizeof(double));
  return action;
}

int Communicator::recv_discrete_action(int agent) {
  return static_cast<int>(recv_action(agent)[0]);
}

}  // namespace smarties_tpu

// ---- flat C API ----------------------------------------------------------
using smarties_tpu::Communicator;

extern "C" {

void* smarties_tpu_create(const char* socket_path) {
  try {
    return new Communicator(socket_path);
  } catch (...) {
    return nullptr;
  }
}
void smarties_tpu_destroy(void* c) { delete static_cast<Communicator*>(c); }

#define COMM static_cast<Communicator*>(c)

void smarties_tpu_set_state_action_dims(void* c, int ds, int da) {
  COMM->set_state_action_dims(ds, da);
}
void smarties_tpu_set_action_scales(void* c, const double* up,
                                    const double* lo, int bounds, int d) {
  COMM->set_action_scales(std::vector<double>(up, up + d),
                          std::vector<double>(lo, lo + d), bounds != 0);
}
void smarties_tpu_set_action_options(void* c, const int* opt, int d) {
  COMM->set_action_options(std::vector<int>(opt, opt + d));
}
void smarties_tpu_set_state_observable(void* c, const int* ob, int d) {
  std::vector<bool> v(d);
  for (int i = 0; i < d; ++i) v[i] = ob[i] != 0;
  COMM->set_state_observable(v);
}
void smarties_tpu_set_num_agents(void* c, int n) { COMM->set_num_agents(n); }
void smarties_tpu_set_team(void* c, int env_id, int rank, int nranks) {
  COMM->set_team(env_id, rank, nranks);
}
void smarties_tpu_env_has_distributed_agents(void* c) {
  COMM->env_has_distributed_agents();
}
void smarties_tpu_send_init_state(void* c, const double* s, int d, int a) {
  COMM->send_init_state(std::vector<double>(s, s + d), a);
}
void smarties_tpu_send_state(void* c, const double* s, int d, double r,
                             int a) {
  COMM->send_state(std::vector<double>(s, s + d), r, a);
}
void smarties_tpu_send_term_state(void* c, const double* s, int d, double r,
                                  int a) {
  COMM->send_term_state(std::vector<double>(s, s + d), r, a);
}
void smarties_tpu_send_last_state(void* c, const double* s, int d, double r,
                                  int a) {
  COMM->send_last_state(std::vector<double>(s, s + d), r, a);
}
int smarties_tpu_recv_action(void* c, double* action, int d, int a) {
  try {
    auto v = COMM->recv_action(a);
    for (int i = 0; i < d && i < static_cast<int>(v.size()); ++i)
      action[i] = v[i];
    return 0;
  } catch (smarties_tpu::TrainingTerminated&) {
    return 1;
  }
}

}  // extern "C"
