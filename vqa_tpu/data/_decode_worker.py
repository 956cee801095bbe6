"""Decode worker subprocess for ``decode_batch(backend='native_mp')``.

The torch reference parallelizes host decode with DataLoader *worker
processes* (/root/reference/main.py:126 ``num_workers``). The TPU-native
equivalent keeps that process-pool model but deliberately avoids
``multiprocessing``: plain ``fork`` of a process that already runs jax/axon
client threads clones held locks into the child and deadlocks
nondeterministically (observed in production), while ``spawn``/``forkserver``
re-execute the parent's ``__main__`` in every worker — a footgun for any
user script without a ``__main__`` guard, and a multi-second jax re-import
per worker here.

Instead the pool (images.py:_SubprocPool) launches plain subprocesses
running ``serve()`` over a binary stdin/stdout pipe protocol:

  request:  b"REQ <n> <host_size> <synthetic:0|1>\\n" + n utf-8 path lines
  reply:    b"OK <n> <host_size>\\n" + n*S*S*3 raw uint8 bytes (NHWC rows)
        or  b"ERR <len>\\n" + <len> bytes of repr(exception)

One request is fully read before the reply is written, so the parent may
write all workers' (small) requests first and then collect the (large)
replies without pipe deadlock. Each worker decodes its chunk with the
native C++ decoder on a single in-process thread — parallelism comes from
the pool, exactly like torch's worker model.
"""

from __future__ import annotations

import sys


def serve() -> None:
    # Preemption supervisors (SLURM, `kill -- -PGID`) deliver SIGTERM to the
    # whole process group, and this worker is a plain subprocess in the
    # parent's group. The parent's PreemptionGuard needs workers alive long
    # enough to serve the in-flight batch so training reaches its
    # step-boundary checkpoint — so ignore SIGTERM here. Clean shutdown is
    # the parent closing our stdin (readline → b"" below); an escalating
    # supervisor's SIGKILL still works.
    import signal
    try:
        signal.signal(signal.SIGTERM, signal.SIG_IGN)
    except (ValueError, OSError):  # non-main thread / exotic platform
        pass
    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    # light imports only (numpy/PIL/ctypes): vqa_tpu.data's __init__ is
    # lazy by design and images.py never imports jax
    from vqa_tpu.data.images import decode_batch

    while True:
        line = stdin.readline()
        if not line:
            return  # parent closed the pipe: clean shutdown
        parts = line.split()
        if not parts or parts[0] != b"REQ":
            return
        n, host_size, synth = int(parts[1]), int(parts[2]), int(parts[3])
        paths = [stdin.readline().rstrip(b"\n").decode() for _ in range(n)]
        try:
            out = decode_batch(paths, host_size,
                               synthetic_fallback=bool(synth),
                               backend="auto", native_threads=1)
            stdout.write(b"OK %d %d\n" % (out.shape[0], host_size))
            stdout.write(out.tobytes())
        except Exception as e:  # report and keep serving
            msg = repr(e).encode("utf-8", "replace")[:1000]
            stdout.write(b"ERR %d\n" % len(msg))
            stdout.write(msg)
        stdout.flush()


if __name__ == "__main__":
    serve()
