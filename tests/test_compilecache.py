"""Persistent-compile-cache product flow (utils/compilecache): seed
extraction semantics — idempotent, never-overwriting, failure-tolerant."""

import os
import tarfile

import pytest

from moonrtx_tpu.utils import compilecache


@pytest.fixture
def seeded_env(monkeypatch, tmp_path):
    src = tmp_path / "seeds"
    dest = tmp_path / "jaxcache"
    src.mkdir()
    dest.mkdir()
    monkeypatch.setattr(compilecache, "seed_dir", lambda: str(src))
    return src, dest


def _make_archive(src, name, entries):
    raw = src / "raw"
    raw.mkdir(exist_ok=True)
    with tarfile.open(src / name, "w:xz") as tf:
        for fname, content in entries.items():
            p = raw / fname
            p.write_bytes(content)
            tf.add(str(p), arcname=fname)


def test_seed_extracts_and_is_idempotent(seeded_env):
    src, dest = seeded_env
    _make_archive(src, "jaxcache_seed_tpu.tar.xz",
                  {"jit_a-123-cache": b"AAA", "jit_b-456-cache": b"BBB"})
    added = compilecache.seed_from_package(str(dest))
    assert added == 2
    assert (dest / "jit_a-123-cache").read_bytes() == b"AAA"
    # marker written: second call is a no-op even if entries were removed
    (dest / "jit_a-123-cache").unlink()
    assert compilecache.seed_from_package(str(dest)) == 0
    assert not (dest / "jit_a-123-cache").exists()


def test_seed_never_overwrites_existing_entries(seeded_env):
    src, dest = seeded_env
    (dest / "jit_a-123-cache").write_bytes(b"LOCAL")
    _make_archive(src, "jaxcache_seed_tpu.tar.xz",
                  {"jit_a-123-cache": b"PACKAGED",
                   "jit_c-789-cache": b"CCC"})
    added = compilecache.seed_from_package(str(dest))
    assert added == 1
    # a locally-compiled entry wins over the shipped one
    assert (dest / "jit_a-123-cache").read_bytes() == b"LOCAL"
    assert (dest / "jit_c-789-cache").read_bytes() == b"CCC"


def test_corrupt_archive_is_nonfatal(seeded_env, capsys):
    src, dest = seeded_env
    (src / "jaxcache_seed_tpu.tar.xz").write_bytes(b"not a tarball")
    added = compilecache.seed_from_package(str(dest))
    assert added == 0
    assert "Warning" in capsys.readouterr().err
    # and a good archive alongside still seeds
    _make_archive(src, "jaxcache_seed_other.tar.xz",
                  {"jit_d-1-cache": b"DDD"})
    assert compilecache.seed_from_package(str(dest)) == 1


def test_no_seed_dir_is_noop(monkeypatch, tmp_path):
    monkeypatch.setattr(compilecache, "seed_dir",
                        lambda: str(tmp_path / "absent"))
    assert compilecache.seed_from_package(str(tmp_path)) == 0


def test_jaxcache_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("MOONRTX_JAXCACHE", str(tmp_path / "override"))
    assert compilecache.cache_dir() == str(tmp_path / "override")
    monkeypatch.delenv("MOONRTX_JAXCACHE")
    assert compilecache.cache_dir().endswith(os.path.join("jaxcache"))


def test_packaged_seed_archive_is_wellformed():
    """The committed archive must be a readable tar.xz of cache entries."""
    src = compilecache.seed_dir()
    archives = [f for f in os.listdir(src)] if os.path.isdir(src) else []
    archives = [f for f in archives if f.endswith(".tar.xz")]
    assert archives, "no packaged seed archive committed"
    for name in archives:
        with tarfile.open(os.path.join(src, name), "r:xz") as tf:
            names = tf.getnames()
            assert names
            assert all("/" not in n and n.endswith("-cache")
                       for n in names), names[:3]


def test_no_seed_env_suppresses_seeding(seeded_env, monkeypatch):
    """MOONRTX_NO_SEED (set by tools/pack_compile_cache.py) must keep a
    capture run's staging directory free of packaged entries. Presence
    check: ANY value (incl. "0") disables, matching the repo's
    MOONRTX_NO_WARM_START convention."""
    import jax

    src, dest = seeded_env
    _make_archive(src, "jaxcache_seed_tpu.tar.xz", {"jit_z-1-cache": b"Z"})
    monkeypatch.setenv("MOONRTX_JAXCACHE", str(dest))
    monkeypatch.setenv("MOONRTX_NO_SEED", "0")
    monkeypatch.setattr(compilecache, "_ENABLED", False)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        compilecache.enable()
        assert not (dest / "jit_z-1-cache").exists()
        monkeypatch.setattr(compilecache, "_ENABLED", False)
        monkeypatch.delenv("MOONRTX_NO_SEED")
        compilecache.enable()
        assert (dest / "jit_z-1-cache").exists()
    finally:
        # enable() mutates process-global jax config; the suite must not
        # keep persisting compiles into a pruned pytest tmp dir
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def test_seed_messages_go_to_stderr(seeded_env, capsys):
    """bench.py's stdout contract is one JSON line; seeding diagnostics
    must print to stderr (round-4 review finding)."""
    src, dest = seeded_env
    _make_archive(src, "jaxcache_seed_tpu.tar.xz", {"jit_e-1-cache": b"E"})
    compilecache.seed_from_package(str(dest))
    captured = capsys.readouterr()
    assert captured.out == ""
    assert "Seeded 1" in captured.err


def test_prune_stale_sweeps_only_old_unseeded_entries(tmp_path):
    """The lifecycle sweep removes entries untouched past the age cutoff;
    keeps fresh entries, markers, and — critically — SEEDED entries of
    any age (their marker blocks re-extraction, so pruning them would be
    a permanent cold-start regression on idle machines — round-5 review
    finding). Orphaned per-pid .tmp partials are swept after a day."""
    import time

    d = tmp_path / "jaxcache"
    d.mkdir()
    old = time.time() - 90 * 86400
    (d / "jit_dead-1-cache").write_bytes(b"X")
    os.utime(d / "jit_dead-1-cache", (old, old))
    (d / "jit_live-1-cache").write_bytes(b"Y")
    # seeded entry, equally old — protected by the marker manifest
    (d / "jit_seeded-1-cache").write_bytes(b"S")
    os.utime(d / "jit_seeded-1-cache", (old, old))
    (d / ".seeded_jaxcache_seed_tpu.tar.xz.abcd").write_text(
        "jit_seeded-1-cache\n")
    os.utime(d / ".seeded_jaxcache_seed_tpu.tar.xz.abcd", (old, old))
    # orphaned partial from an interrupted seeding: swept (>1 day old)
    (d / "jit_partial-1-cache.123.tmp").write_bytes(b"Z")
    os.utime(d / "jit_partial-1-cache.123.tmp", (old, old))
    # in-flight partial (fresh): kept
    (d / "jit_inflight-1-cache.456.tmp").write_bytes(b"W")
    removed = compilecache.prune_stale(str(d), days=60)
    assert removed == 1
    assert not (d / "jit_dead-1-cache").exists()
    assert (d / "jit_live-1-cache").exists()
    assert (d / "jit_seeded-1-cache").exists()
    assert (d / ".seeded_jaxcache_seed_tpu.tar.xz.abcd").exists()
    assert not (d / "jit_partial-1-cache.123.tmp").exists()
    assert (d / "jit_inflight-1-cache.456.tmp").exists()
    # missing dir: no-op, no raise
    assert compilecache.prune_stale(str(tmp_path / "absent")) == 0


def test_seed_marker_is_a_manifest(seeded_env):
    """Seeding writes the archive's entry names into its marker so
    prune_stale can protect them."""
    src, dest = seeded_env
    _make_archive(src, "jaxcache_seed_tpu.tar.xz",
                  {"jit_m1-cache": b"1", "jit_m2-cache": b"2"})
    compilecache.seed_from_package(str(dest))
    markers = [f for f in os.listdir(str(dest)) if f.startswith(".seeded_")]
    assert len(markers) == 1
    body = (dest / markers[0]).read_text()
    assert set(body.split()) == {"jit_m1-cache", "jit_m2-cache"}


def test_prefix_named_archive_keeps_sibling_markers(seeded_env):
    """An archive whose filename is a prefix of another's must not prune
    the other's markers when re-seeded (advisor round-4 finding: the
    prune matched `.seeded_<name>` without the trailing dot)."""
    src, dest = seeded_env
    _make_archive(src, "jaxcache_seed_tpu.tar.xz", {"jit_p-1-cache": b"P"})
    _make_archive(src, "jaxcache_seed_tpu.tar.xz.old.tar.xz",
                  {"jit_q-1-cache": b"Q"})
    assert compilecache.seed_from_package(str(dest)) == 2
    markers = [f for f in os.listdir(str(dest)) if f.startswith(".seeded_")]
    assert len(markers) == 2, markers
    # replace the SHORT-named archive: only ITS marker may be pruned
    _make_archive(src, "jaxcache_seed_tpu.tar.xz", {"jit_p-2-cache": b"P2"})
    assert compilecache.seed_from_package(str(dest)) == 1
    markers = [f for f in os.listdir(str(dest)) if f.startswith(".seeded_")]
    assert len(markers) == 2, markers
    assert any(".old.tar.xz." in m for m in markers), markers


def test_replaced_archive_reseeds(seeded_env):
    """An upgraded package replaces the archive under the same filename;
    the content-keyed marker must re-seed it (a name-only marker skipped
    it forever — round-4 fix)."""
    import os
    import time

    src, dest = seeded_env
    _make_archive(src, "jaxcache_seed_tpu.tar.xz", {"jit_v1-1-cache": b"1"})
    assert compilecache.seed_from_package(str(dest)) == 1
    # replace the archive (new content, same name, bumped mtime)
    _make_archive(src, "jaxcache_seed_tpu.tar.xz", {"jit_v2-1-cache": b"2"})
    os.utime(src / "jaxcache_seed_tpu.tar.xz",
             (time.time() + 5, time.time() + 5))
    assert compilecache.seed_from_package(str(dest)) == 1
    assert (dest / "jit_v2-1-cache").exists()
    assert (dest / "jit_v1-1-cache").exists()  # old entries untouched
