"""Pluggable LogStore: the commit-atomicity primitives the governed
table builds on, behind one small interface.

Every atomicity guarantee in the manifest table format reduces to a
handful of primitive operations — create-token-if-absent (the CAS a
snapshot claim races on), read/age/revoke a token, and replace the
manifest directory (expire's swap). The default implementation uses the
POSIX guarantees this engine has relied on so far (``mkdir`` is atomic,
same-filesystem ``rename`` is atomic). But the reference's real
substrate is S3 (``/root/reference/app.py:461-463`` uploads to a
bucket), where **neither primitive exists**: there are no directories,
``rename`` is copy+delete, and the only atomic conditional operation is
a conditional PUT (``If-None-Match: *``, supported by S3 since late
2024) or an external CAS table (the DynamoDB LogStore Delta ships for
S3). This module makes the substrate explicit:

- :class:`PosixLogStore` — mkdir-token CAS, rename takeover, two-rename
  swap. The default; byte-for-byte the behavior the concurrency tests
  have always pinned.
- :class:`ObjectStoreLogStore` — a *simulated* object store over the
  local filesystem that forbids itself every POSIX-only primitive:
  tokens are single OBJECTS created atomically with
  ``O_CREAT | O_EXCL`` (the local analog of a conditional PUT — one
  writer wins, the loser gets the S3 ``PreconditionFailed``), the owner
  rides INSIDE the token object so claim+ownership is ONE atomic write
  (the POSIX store's separate owner file has a (benign, verify-time
  healed) window), takeover is an atomic single-object rename modelling
  a DynamoDB-style conditional delete, and the manifest swap is
  COPY+DELETE — deliberately non-atomic, exactly like S3 — which is
  safe for writers only because ``expire_manifest_history`` holds a
  claim lease across it (readers are documented; a production S3 expire
  would flip a generation-pointer object instead).

Stores are selected per manifest directory through a process-level
registry (:func:`set_log_store` / :func:`log_store_for`), so every
table verb keeps its signature and tests re-run the SAME concurrency
scenarios against either substrate.
"""

from __future__ import annotations

import os
import shutil
import time


class PosixLogStore:
    """Commit primitives from POSIX guarantees: ``mkdir`` is the CAS,
    ``rename`` the atomic revoke/swap. Correct on local disks, NFSv4,
    and HDFS-like stores with atomic rename; NOT correct on S3."""

    name = "posix"

    def ensure_token_root(self, manifest_dir: str, token_root: str) -> bool:
        """Create the token root INSIDE an existing manifest dir.
        Returns False when the manifest dir itself is absent (expire
        swap in flight / table never created) — the caller raises its
        retryable error. ``os.mkdir`` (not makedirs) so a missing
        parent can never be silently resurrected mid-swap."""
        try:
            os.mkdir(token_root)
        except FileExistsError:
            pass
        except FileNotFoundError:
            return False
        return True

    def try_create_token(self, token_path: str, owner: str) -> bool:
        """Atomic create-if-absent; True = this caller won the CAS.
        mkdir is the atomic step; the owner record lands as a second
        write (commit-time verify_claim heals the tiny window)."""
        try:
            os.mkdir(token_path)
        except FileExistsError:
            return False
        with open(os.path.join(token_path, "owner"), "w") as fh:
            fh.write(owner)
        return True

    def read_token_owner(self, token_path: str) -> str | None:
        try:
            with open(os.path.join(token_path, "owner")) as fh:
                return fh.read().strip()
        except OSError:
            return None

    def token_age(self, token_path: str) -> float | None:
        """Seconds since the token was created; None when absent."""
        try:
            return time.time() - os.stat(token_path).st_mtime
        except FileNotFoundError:
            return None

    def revoke_token(self, token_path: str, aside_suffix: str) -> bool:
        """Atomically move a (stale) token aside — exactly one
        concurrent revoker wins; the original claimant's ownership is
        revoked with the move (its verify_claim fails loudly)."""
        try:
            os.rename(token_path, token_path + aside_suffix)
            return True
        except OSError:
            return False

    def delete_token(self, token_path: str) -> None:
        shutil.rmtree(token_path, ignore_errors=True)

    def list_tokens(self, token_root: str) -> list[str]:
        try:
            return sorted(os.listdir(token_root))
        except FileNotFoundError:
            return []

    def move_token(self, src: str, dst: str) -> None:
        """Move a token; REFUSES an existing destination (shutil.move
        would nest the source INSIDE an existing dst dir — silently
        corrupting a live claimant's token) — the destination owner
        wins and the source is left in place."""
        if os.path.exists(dst):
            return
        shutil.move(src, dst)

    def copy_token(self, src: str, dst: str) -> None:
        """Copy a token (owner record included) without disturbing the
        source — expire pre-seeds surviving leases into its replacement
        manifest dir this way. Existing destination wins (same rule as
        :meth:`move_token`)."""
        if os.path.exists(dst):
            return
        shutil.copytree(src, dst)

    def replace_dir(self, new_dir: str, live_dir: str, aside_dir: str) -> None:
        """Expire's swap: live -> aside, new -> live, two atomic
        same-filesystem renames. A failed second leg restores the
        original so the table never stays headless on error."""
        os.rename(live_dir, aside_dir)
        try:
            os.rename(new_dir, live_dir)
        except BaseException:
            os.rename(aside_dir, live_dir)  # restore: swap didn't happen
            raise

    def move_dir(self, src: str, dst: str) -> None:
        """Atomic directory move (crash recovery's restore leg)."""
        os.rename(src, dst)


class ObjectStoreLogStore:
    """Simulated object-store substrate: every primitive is built ONLY
    from operations a bucket offers. Tokens are single objects (files)
    whose CONTENT is the owner uuid:

    - create: ``O_CREAT | O_EXCL`` — the local analog of a conditional
      PUT (``If-None-Match: *``); atomic, one winner, claim and
      ownership in the same write.
    - revoke: atomic single-object rename standing in for the
      DynamoDB-conditional-delete a real S3 LogStore uses (local
      rename of ONE file is the closest single-winner local analog).
    - swap: **copy + delete, non-atomic** — honest S3 semantics. Safe
      against writers because expire holds a claim lease across it;
      concurrent lock-free readers can observe the window (same caveat
      as S3 without a pointer object — documented, and the reason a
      production deployment flips a generation pointer instead).

    Used by the test suite to prove the commit protocol (claims,
    conflict-retry merges, expire's lease) holds without ANY POSIX-only
    primitive."""

    name = "object"

    def ensure_token_root(self, manifest_dir: str, token_root: str) -> bool:
        # buckets have no directories: "creating the root" is a no-op;
        # the manifest-exists check is the same listing a bucket answers
        if not os.path.isdir(manifest_dir):
            return False
        os.makedirs(token_root, exist_ok=True)  # mechanical (local FS only)
        return True

    def try_create_token(self, token_path: str, owner: str) -> bool:
        try:
            fd = os.open(token_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        except FileNotFoundError:
            return False  # root vanished (swap window): lose the CAS
        try:
            os.write(fd, owner.encode())
        finally:
            os.close(fd)
        return True

    def read_token_owner(self, token_path: str) -> str | None:
        try:
            with open(token_path) as fh:
                return fh.read().strip()
        except OSError:
            return None

    def token_age(self, token_path: str) -> float | None:
        try:
            return time.time() - os.stat(token_path).st_mtime
        except FileNotFoundError:
            return None

    def revoke_token(self, token_path: str, aside_suffix: str) -> bool:
        try:
            os.rename(token_path, token_path + aside_suffix)
            return True
        except OSError:
            return False

    def delete_token(self, token_path: str) -> None:
        try:
            os.remove(token_path)
        except FileNotFoundError:
            pass
        except IsADirectoryError:  # pre-switch posix token: best effort
            shutil.rmtree(token_path, ignore_errors=True)

    def list_tokens(self, token_root: str) -> list[str]:
        try:
            return sorted(os.listdir(token_root))
        except FileNotFoundError:
            return []

    def move_token(self, src: str, dst: str) -> None:
        # copy + delete: object stores have no rename. Tokens being
        # single small objects keeps the non-atomic window harmless
        # here (expire's lease excludes every competing writer).
        # Existing destination wins — a blind copy2 would overwrite a
        # live claimant's token with this (stale) one.
        if os.path.exists(dst):
            return
        shutil.copy2(src, dst) if os.path.isfile(src) else shutil.copytree(
            src, dst
        )
        self.delete_token(src)

    def copy_token(self, src: str, dst: str) -> None:
        """Copy a token object (owner rides inside it) leaving the
        source untouched; existing destination wins."""
        if os.path.exists(dst):
            return
        if os.path.isfile(src):
            shutil.copy2(src, dst)
        else:  # pre-switch posix token: best effort
            shutil.copytree(src, dst)

    def replace_dir(self, new_dir: str, live_dir: str, aside_dir: str) -> None:
        # honest S3 semantics: copy every object, then delete sources.
        # Non-atomic — valid ONLY under expire's claim lease (writers
        # excluded); see class docstring for the reader caveat.
        shutil.copytree(live_dir, aside_dir)
        shutil.rmtree(live_dir)
        shutil.copytree(new_dir, live_dir)
        shutil.rmtree(new_dir)

    def move_dir(self, src: str, dst: str) -> None:
        # copy + delete, the only "move" a bucket has
        shutil.copytree(src, dst)
        shutil.rmtree(src)


_DEFAULT_STORE = PosixLogStore()
#: per-manifest-dir overrides (absolute path -> store); POSIX otherwise
_STORES: dict[str, object] = {}


def set_log_store(manifest_dir: str, store: object | None) -> None:
    """Route a manifest directory's commit primitives through ``store``
    (None restores the POSIX default). Process-local, like the claim
    registry — a cluster deployment would configure one store per
    filesystem scheme instead."""
    key = os.path.abspath(manifest_dir)
    if store is None:
        _STORES.pop(key, None)
    else:
        _STORES[key] = store


def log_store_for(manifest_dir: str):
    """The LogStore governing ``manifest_dir`` (POSIX default)."""
    return _STORES.get(os.path.abspath(manifest_dir), _DEFAULT_STORE)
