// Native benchmark harness: fork-isolated per-problem solves with watchdog.
//
// TPU-native equivalent of the reference CUTEst driver executable
// (src/test/cutest/sleqp_cutest_main.c:186-229): one child process per
// problem, alarm-based timeout, per-problem CSV aggregation.  A crashed or
// hung solve cannot take down the sweep — the same process-isolation role
// the reference implements in C, here driving the Python solver CLI.
//
// Build:   make -C native          (produces native/sleqp_harness)
// Usage:   ./sleqp_harness [--timeout SECONDS] [--python PYBIN] [problems...]
//          (no problem args => full built-in HS suite)

#include <sys/types.h>
#include <sys/wait.h>

#include <csignal>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kDefaultTimeoutSeconds = 300;

// Problems of the built-in Hock-Schittkowski registry (harness/hs.py).
const char* kDefaultProblems[] = {
    "hs1",  "hs3",  "hs4",  "hs5",  "hs6",  "hs7",  "hs8",  "hs9",  "hs10",
    "hs11", "hs12", "hs14", "hs15", "hs16", "hs18", "hs19", "hs21", "hs22",
    "hs23", "hs24", "hs26", "hs27", "hs28", "hs29", "hs30", "hs31", "hs32",
    "hs33", "hs34", "hs35", "hs36", "hs37", "hs38", "hs39", "hs40", "hs41",
    "hs42", "hs43", "hs44", "hs45", "hs48", "hs49", "hs50", "hs51", "hs52",
    "hs53", "hs60", "hs63", "hs64", "hs65", "hs71", "hs76", "hs77", "hs78",
    "hs79", "hs80", "hs100", "hs110", "hs113",
};

struct Result {
  std::string name;
  int exit_code = -1;
  bool timed_out = false;
  bool crashed = false;
};

Result run_problem(const std::string& python, const std::string& name,
                   int timeout_seconds) {
  Result result;
  result.name = name;

  pid_t pid = fork();
  if (pid < 0) {
    perror("fork");
    result.crashed = true;
    return result;
  }

  if (pid == 0) {
    // Child: watchdog via alarm (reference grace/timeout handling,
    // sleqp_cutest_main.c:26,186-229), then exec the solver CLI.
    alarm(static_cast<unsigned>(timeout_seconds));
    execlp(python.c_str(), python.c_str(), "-m", "sleqp_tpu", "--hs",
           name.c_str(), "--json", static_cast<char*>(nullptr));
    perror("execlp");
    _exit(127);
  }

  int status = 0;
  if (waitpid(pid, &status, 0) < 0) {
    perror("waitpid");
    result.crashed = true;
    return result;
  }
  if (WIFEXITED(status)) {
    result.exit_code = WEXITSTATUS(status);
  } else if (WIFSIGNALED(status)) {
    int sig = WTERMSIG(status);
    result.timed_out = (sig == SIGALRM);
    result.crashed = !result.timed_out;
    result.exit_code = 128 + sig;
  }
  return result;
}

}  // namespace

int main(int argc, char** argv) {
  int timeout_seconds = kDefaultTimeoutSeconds;
  std::string python = "python3";
  std::vector<std::string> problems;

  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "--timeout") && i + 1 < argc) {
      timeout_seconds = atoi(argv[++i]);
    } else if (!strcmp(argv[i], "--python") && i + 1 < argc) {
      python = argv[++i];
    } else {
      problems.emplace_back(argv[i]);
    }
  }
  if (problems.empty()) {
    for (const char* name : kDefaultProblems) problems.emplace_back(name);
  }

  int solved = 0, failed = 0, timeouts = 0, crashes = 0;
  for (const std::string& name : problems) {
    Result r = run_problem(python, name, timeout_seconds);
    const char* verdict = r.timed_out  ? "TIMEOUT"
                          : r.crashed  ? "CRASH"
                          : r.exit_code == 0 ? "OPTIMAL"
                                             : "FAILED";
    fprintf(stderr, "%-8s %s\n", name.c_str(), verdict);
    if (r.timed_out) {
      ++timeouts;
    } else if (r.crashed) {
      ++crashes;
    } else if (r.exit_code == 0) {
      ++solved;
    } else {
      ++failed;
    }
  }

  printf("solved=%d failed=%d timeouts=%d crashes=%d total=%zu\n", solved,
         failed, timeouts, crashes, problems.size());
  return (failed + timeouts + crashes) == 0 ? 0 : 1;
}
