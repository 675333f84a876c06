"""Per-user on-disk cache root for derived artifacts (persisted ANN/LSH
indexes, the protobuf-shim zip shipped to executors, multifile bench
copies).

World-writable ``/tmp`` paths are a tampering vector on shared hosts: a
predictable name lets another local user pre-plant content that this
process would then trust (and, for the shim zip, ship to executor
Python workers — arbitrary code execution). Everything cached on disk
therefore lives under ONE per-user directory created with mode 0700 and
ownership-verified on every access, so foreign processes can neither
read nor pre-plant artifacts. The verification uses ``lstat`` and
rejects symlinks outright: a pre-planted symlink at the predictable
name would otherwise redirect both the ownership check and the cache
writes to an attacker-chosen target (and ``/tmp``'s sticky bit only
stops *replacing* an entry, not creating one first)."""

from __future__ import annotations

import os
import stat
import tempfile


def user_cache_dir() -> str:
    """The per-user 0700 cache root; created on first use; ownership,
    mode, and non-symlink-ness re-verified on every call (a pre-existing
    entry owned by another uid, or any symlink, is an error — never
    silently trusted or followed)."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_cache_u{uid}")
    try:
        st = os.lstat(root)
    except FileNotFoundError:
        os.makedirs(root, mode=0o700, exist_ok=True)
        st = os.lstat(root)
    if stat.S_ISLNK(st.st_mode):
        raise PermissionError(
            f"cache path {root} is a symlink — refusing to follow a "
            f"pre-planted redirection on a shared host"
        )
    if not stat.S_ISDIR(st.st_mode):
        raise PermissionError(f"cache path {root} exists and is not a directory")
    if hasattr(os, "getuid") and st.st_uid != uid:
        raise PermissionError(
            f"cache dir {root} is owned by uid {st.st_uid}, not the current "
            f"user ({uid}) — refusing to trust foreign cache contents"
        )
    if stat.S_IMODE(st.st_mode) != 0o700:
        # pre-existing dir from an older layout / permissive umask —
        # ours by the checks above, so tightening is safe
        os.chmod(root, 0o700)
    return root
