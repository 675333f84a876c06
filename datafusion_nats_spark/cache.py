"""Per-user on-disk cache root for derived artifacts (persisted ANN/LSH
indexes, the protobuf-shim zip shipped to executors, multifile bench
copies).

World-writable ``/tmp`` paths are a tampering vector on shared hosts: a
predictable name lets another local user pre-plant content that this
process would then trust (and, for the shim zip, ship to executor
Python workers — arbitrary code execution). Everything cached on disk
therefore lives under ONE per-user directory created with mode 0700 and
ownership-verified on every access, so foreign processes can neither
read nor pre-plant artifacts."""

from __future__ import annotations

import os
import stat
import tempfile


def user_cache_dir() -> str:
    """The per-user 0700 cache root; created on first use, ownership and
    mode re-verified on every call (a pre-existing dir owned by another
    uid is an error, never silently trusted)."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_cache_u{uid}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.stat(root)
    if hasattr(os, "getuid") and st.st_uid != uid:
        raise PermissionError(
            f"cache dir {root} is owned by uid {st.st_uid}, not the current "
            f"user ({uid}) — refusing to trust foreign cache contents"
        )
    if stat.S_IMODE(st.st_mode) != 0o700:
        # pre-existing dir from an older layout / permissive umask
        os.chmod(root, 0o700)
    return root
