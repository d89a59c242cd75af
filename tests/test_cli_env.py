"""CDCSDK_SERVER_* env-var config munging (E9).

Reference: ServerApp.configToProperties (cdcsdk-server-core/.../
ServerApp.java:237-253 — SHELL names lowercased, '_' → '.', prefix
re-rooted) and ServerAppTest.testProps (ServerAppTest.java:52-78 — the
munged properties land with their values). Precedence matches the
Quarkus config-source ordering the reference inherits: explicit
command-line flags beat environment."""

import argparse

from cdcsdk_server_ray.__main__ import apply_env_defaults, env_to_properties


def _run_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--lake", required=True)
    p.add_argument("--keys", type=int, default=10_000)
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--window-lsns", type=int, default=0)
    p.add_argument("--exchange", choices=["staged", "groupby"],
                   default="staged")
    p.add_argument("--incremental-snapshot", action="store_true")
    return p


def test_shell_names_munge_to_properties():
    env = {
        "CDCSDK_SERVER_WINDOW_LSNS": "500",
        "CDCSDK_SERVER_LAKE": "/tmp/envlake",
        "CDCSDK_SOURCE_DATABASE_HOST": "db",      # wrong prefix: ignored
        "cdcsdk_server_keys": "1",                # not SHELL-style: ignored
        "PATH": "/usr/bin",                       # unrelated: ignored
    }
    props = env_to_properties(env)
    assert props == {"window.lsns": "500", "lake": "/tmp/envlake"}
    # prefix re-rooting is parameterized exactly like configToProperties
    assert env_to_properties(env, old_prefix="cdcsdk.source.") == {
        "database.host": "db"}


def test_env_defaults_bind_typed_and_satisfy_required():
    env = {
        "CDCSDK_SERVER_LAKE": "/tmp/envlake",
        "CDCSDK_SERVER_KEYS": "777",
        "CDCSDK_SERVER_INCREMENTAL_SNAPSHOT": "true",
        "CDCSDK_SERVER_NOT_A_FLAG": "whatever",   # unknown: ignored
    }
    p = _run_parser()
    applied = apply_env_defaults(p, env)
    assert applied == {"lake": "/tmp/envlake", "keys": 777,
                       "incremental_snapshot": True}
    args = p.parse_args([])                       # compose-style: NO flags
    assert args.lake == "/tmp/envlake"
    assert args.keys == 777
    assert args.incremental_snapshot is True
    assert args.partitions == 32                  # untouched default


def test_explicit_flag_beats_env():
    env = {"CDCSDK_SERVER_KEYS": "777", "CDCSDK_SERVER_LAKE": "/tmp/envlake"}
    p = _run_parser()
    apply_env_defaults(p, env)
    args = p.parse_args(["--keys", "42"])
    assert args.keys == 42                        # flag wins
    assert args.lake == "/tmp/envlake"            # env fills the rest


def test_bad_typed_env_value_exits_with_message():
    import pytest

    p = _run_parser()
    with pytest.raises(SystemExit, match="CDCSDK_SERVER_KEYS"):
        apply_env_defaults(p, {"CDCSDK_SERVER_KEYS": "not-an-int",
                               "CDCSDK_SERVER_LAKE": "/x"})


def test_bad_choices_env_value_exits_with_message():
    import pytest

    p = _run_parser()
    # set_defaults would silently accept this and stream with NO
    # snapshot; the env path must refuse like a command-line flag would
    with pytest.raises(SystemExit, match="CDCSDK_SERVER_EXCHANGE"):
        apply_env_defaults(p, {"CDCSDK_SERVER_EXCHANGE": "Staged",
                               "CDCSDK_SERVER_LAKE": "/x"})
    good = apply_env_defaults(
        _run_parser(), {"CDCSDK_SERVER_EXCHANGE": "groupby",
                        "CDCSDK_SERVER_LAKE": "/x"})
    assert good["exchange"] == "groupby"
