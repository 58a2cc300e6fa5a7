"""Live program reload for serve mode.

The reference runtime reloads *.mtail programs while running: SIGHUP
or an fsnotify event on the progs directory recompiles changed
programs and swaps the VM without restarting the process (reference
internal/runtime/runtime.go:310-332, signal handling in
cmd/mtail/main.go).

Spark shape: each program runs as its own Structured Streaming query,
so a reload is stop-old-query + start-new-query.  The ProgramSet
registry swaps the (store, query) pair under a lock; the HTTP
provider reads through the registry, so /metrics serves the new
program's store on the next scrape.  A changed program's new query
re-reads the log glob from the start (fresh file-source offsets),
matching the reference's semantics that a (re)loaded program's
metrics reflect its own pass over the log.

Compile errors on reload keep the previous program running (the
reference logs the error and leaves the old VM in place —
runtime.go CompileAndRun error path).
"""

from __future__ import annotations

import glob
import hashlib
import os
import sys
import threading


class ProgramSet:
    """Registry of running per-program streaming queries, reloadable
    by rescanning a progs directory.

    start_fn(prog) -> (store, query) starts one program's stream;
    stores must expose .rows() and queries .stop()/.isActive.
    """

    def __init__(self, compile_fn, start_fn):
        self._compile = compile_fn  # (src, name) -> CompiledProgram
        self._start = start_fn
        self._lock = threading.Lock()
        # path -> {"hash": str, "store": ..., "query": ...}
        self._entries: dict[str, dict] = {}
        self._watcher: threading.Thread | None = None
        self._stop_evt = threading.Event()
        self.generation = 0  # bumps on every applied change (tests)

    # ------------------------------------------------------------ serve

    def rows(self) -> list:
        with self._lock:
            stores = [e["store"] for e in self._entries.values()]
        out = []
        for s in stores:
            out.extend(s.rows())
        return out

    def queries(self) -> list:
        with self._lock:
            return [e["query"] for e in self._entries.values()]

    def any_active(self) -> bool:
        return any(q.isActive for q in self.queries())

    # ----------------------------------------------------------- reload

    def scan(self, progs_dir: str) -> int:
        """One reload pass: compile new/changed *.mtail files, swap
        their queries, drop removed ones.  Returns the number of
        applied changes; safe to call from a signal handler or the
        watcher thread (serialized by the lock)."""
        found: dict[str, str] = {}
        for path in sorted(glob.glob(os.path.join(progs_dir, "*.mtail"))):
            try:
                src = open(path).read()
            except OSError:
                continue  # racing an editor's rename
            found[path] = src
        changed = 0
        with self._lock:
            for path in list(self._entries):
                if path not in found:
                    e = self._entries.pop(path)
                    _stop_quiet(e["query"])
                    changed += 1
            for path, src in found.items():
                h = hashlib.md5(src.encode()).hexdigest()
                old = self._entries.get(path)
                if old is not None and old["hash"] == h:
                    continue
                name = os.path.basename(path)
                try:
                    prog = self._compile(src, name)
                except Exception as e:
                    print(
                        f"reload: error compiling {name}: {e}",
                        file=sys.stderr,
                    )
                    continue  # keep the old program running
                if old is not None:
                    _stop_quiet(old["query"])
                store, query = self._start(prog)
                self._entries[path] = {
                    "hash": h, "store": store, "query": query,
                }
                changed += 1
            if changed:
                self.generation += 1
        return changed

    def watch(self, progs_dir: str, interval: float = 1.0) -> "ProgramSet":
        """Poll the progs dir for content changes (the environment's
        fsnotify substitute; the reference also supports polling via
        --poll_interval)."""

        def loop():
            while not self._stop_evt.wait(interval):
                try:
                    self.scan(progs_dir)
                except Exception as e:  # never kill the watcher
                    print(f"reload: scan failed: {e}", file=sys.stderr)

        self._watcher = threading.Thread(
            target=loop, name="mtail-progs-watch", daemon=True
        )
        self._watcher.start()
        return self

    def stop(self):
        self._stop_evt.set()
        if self._watcher is not None:
            self._watcher.join(timeout=5)
        with self._lock:
            for e in self._entries.values():
                _stop_quiet(e["query"])
            self._entries.clear()


def _stop_quiet(query):
    try:
        query.stop()
    except Exception:
        pass
