// Native file watcher for live reload.
//
// The reference polls mtimes of the config and every shader file each
// frame (reference: src/utils.rs:33-54, src/render.rs:497-519). This
// inotify-based watcher turns that into a single non-blocking poll per
// frame: the engine only runs its (authoritative) mtime comparison when
// the kernel reports activity in the watched directories. Watching the
// parent directories (not the files) survives the editor save-via-rename
// pattern.
//
// C ABI consumed via ctypes (reforge_tpu/runtime/watcher.py); graceful
// fallback to pure polling when unavailable.

#include <cerrno>
#include <cstdio>
#include <cstring>
#include <string>
#include <unistd.h>

#include <sys/inotify.h>

extern "C" {

// Returns an inotify fd (>= 0) in non-blocking mode, or -1.
int rf_watch_create(void) {
  return inotify_init1(IN_NONBLOCK);
}

// Watch a directory for anything that changes file contents or names.
// Returns the watch descriptor (>= 0) or -1.
int rf_watch_add_dir(int fd, const char *dir_path) {
  // IN_ATTRIB included so `touch file` (mtime-only change) still triggers a
  // reload, matching the reference's pure-mtime semantics.
  return inotify_add_watch(
      fd, dir_path,
      IN_CLOSE_WRITE | IN_MOVED_TO | IN_MOVED_FROM | IN_CREATE | IN_DELETE |
          IN_MODIFY | IN_ATTRIB);
}

// Drain pending events. Returns 1 if any events were pending, 0 if none,
// -1 on error.
int rf_watch_poll(int fd) {
  char buf[4096];
  int any = 0;
  for (;;) {
    ssize_t n = read(fd, buf, sizeof(buf));
    if (n > 0) {
      any = 1;
      continue;
    }
    if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) break;
    if (n < 0) return any ? 1 : -1;
    if (n == 0) break;
  }
  return any;
}

void rf_watch_close(int fd) { close(fd); }

}  // extern "C"
