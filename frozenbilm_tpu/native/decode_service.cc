// decode_service: multithreaded subprocess-output prefetch service.
//
// TPU-native replacement for the reference's torch DataLoader decode workers
// (extract/extract.py:31-35 runs ffmpeg in 3 loader processes). A pool of
// worker threads executes decode commands (ffmpeg rawvideo pipes), reads the
// full frame stream into host buffers, and hands them to Python through a
// bounded queue so video decode overlaps with TPU inference.
//
// C ABI (ctypes):
//   ds_create(n_workers, capacity)        -> handle
//   ds_submit(h, job_id, argv, n_args)    -> 0/-1   (async)
//   ds_finish(h)                          -> no more submits
//   ds_next(h, &job_id, &size)            -> data* or NULL when drained
//   ds_free_result(data)
//   ds_destroy(h)
//
// Results arrive in completion order. A failed/empty decode yields size 0
// (caller substitutes zeros, matching video_loader.py:54-90 semantics).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/wait.h>
#include <unistd.h>

namespace {

struct Job {
  int64_t id;
  std::vector<std::string> argv;
};

struct Result {
  int64_t id;
  uint8_t* data;  // malloc'd, ownership passes to Python
  int64_t size;
};

struct Service {
  std::mutex mu;
  std::condition_variable cv_jobs;
  std::condition_variable cv_results;
  std::deque<Job> jobs;
  std::deque<Result> results;
  std::vector<std::thread> workers;
  size_t capacity;
  bool finished = false;   // no more submits
  bool shutdown = false;   // destroy requested
  int inflight = 0;

  bool drained() {
    return results.empty() && jobs.empty() && inflight == 0 && finished;
  }
};

// Run argv, read entire stdout into a growable malloc buffer.
// Returns 0 on success; *out/*size always set (possibly empty).
int run_and_capture(const std::vector<std::string>& argv, uint8_t** out,
                    int64_t* size) {
  *out = nullptr;
  *size = 0;
  int pipefd[2];
  if (pipe(pipefd) != 0) return -1;

  pid_t pid = fork();
  if (pid < 0) {
    close(pipefd[0]);
    close(pipefd[1]);
    return -1;
  }
  if (pid == 0) {  // child
    close(pipefd[0]);
    dup2(pipefd[1], STDOUT_FILENO);
    close(pipefd[1]);
    int devnull = open("/dev/null", O_WRONLY);
    if (devnull >= 0) dup2(devnull, STDERR_FILENO);
    std::vector<char*> cargv;
    cargv.reserve(argv.size() + 1);
    for (const auto& a : argv) cargv.push_back(const_cast<char*>(a.c_str()));
    cargv.push_back(nullptr);
    execvp(cargv[0], cargv.data());
    _exit(127);
  }
  // parent
  close(pipefd[1]);
  int64_t cap = 1 << 22;  // 4 MiB initial
  uint8_t* buf = static_cast<uint8_t*>(malloc(cap));
  int64_t len = 0;
  while (buf != nullptr) {
    if (len == cap) {
      cap *= 2;
      uint8_t* nbuf = static_cast<uint8_t*>(realloc(buf, cap));
      if (nbuf == nullptr) {
        free(buf);
        buf = nullptr;
        break;
      }
      buf = nbuf;
    }
    ssize_t r = read(pipefd[0], buf + len, cap - len);
    if (r < 0) {
      if (errno == EINTR) continue;
      break;
    }
    if (r == 0) break;
    len += r;
  }
  close(pipefd[0]);
  int status = 0;
  waitpid(pid, &status, 0);
  bool ok = buf != nullptr && WIFEXITED(status) && WEXITSTATUS(status) == 0;
  if (!ok || len == 0) {
    free(buf);
    *out = nullptr;
    *size = 0;
    return ok ? 0 : -1;
  }
  *out = buf;
  *size = len;
  return 0;
}

void worker_loop(Service* s) {
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lk(s->mu);
      s->cv_jobs.wait(lk, [s] {
        return s->shutdown || !s->jobs.empty() ||
               (s->finished && s->jobs.empty());
      });
      if (s->shutdown) return;
      if (s->jobs.empty()) {
        if (s->finished) return;
        continue;
      }
      job = std::move(s->jobs.front());
      s->jobs.pop_front();
      s->inflight++;
    }
    uint8_t* data = nullptr;
    int64_t size = 0;
    run_and_capture(job.argv, &data, &size);
    {
      std::unique_lock<std::mutex> lk(s->mu);
      // bounded queue: block while full (unless shutting down)
      s->cv_jobs.wait(lk, [s] {
        return s->shutdown || s->results.size() < s->capacity;
      });
      if (s->shutdown) {
        free(data);
        s->inflight--;
        return;
      }
      s->results.push_back(Result{job.id, data, size});
      s->inflight--;
      s->cv_results.notify_all();
    }
  }
}

}  // namespace

extern "C" {

void* ds_create(int n_workers, int capacity) {
  auto* s = new Service();
  s->capacity = capacity > 0 ? static_cast<size_t>(capacity) : 4;
  for (int i = 0; i < (n_workers > 0 ? n_workers : 1); ++i) {
    s->workers.emplace_back(worker_loop, s);
  }
  return s;
}

int ds_submit(void* handle, int64_t job_id, const char** argv, int n_args) {
  auto* s = static_cast<Service*>(handle);
  Job job;
  job.id = job_id;
  for (int i = 0; i < n_args; ++i) job.argv.emplace_back(argv[i]);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    if (s->finished || s->shutdown) return -1;
    s->jobs.push_back(std::move(job));
  }
  s->cv_jobs.notify_one();
  return 0;
}

void ds_finish(void* handle) {
  auto* s = static_cast<Service*>(handle);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->finished = true;
  }
  s->cv_jobs.notify_all();
}

uint8_t* ds_next(void* handle, int64_t* job_id, int64_t* size) {
  auto* s = static_cast<Service*>(handle);
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_results.wait(lk, [s] {
    return s->shutdown || !s->results.empty() || s->drained();
  });
  if (s->shutdown || s->results.empty()) {
    *job_id = -1;
    *size = 0;
    return nullptr;
  }
  Result r = s->results.front();
  s->results.pop_front();
  s->cv_jobs.notify_all();  // space freed
  *job_id = r.id;
  *size = r.size;
  return r.data;  // may be NULL with size 0 (failed decode)
}

void ds_free_result(uint8_t* data) { free(data); }

void ds_destroy(void* handle) {
  auto* s = static_cast<Service*>(handle);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->shutdown = true;
  }
  s->cv_jobs.notify_all();
  s->cv_results.notify_all();
  for (auto& t : s->workers) t.join();
  for (auto& r : s->results) free(r.data);
  delete s;
}

}  // extern "C"
