"""CLI — the ServerApp/Main analogue (`python -m cdcsdk_server_ray ...`).

Reference: Quarkus Main/ServerApp boot + env-var config munging
(/root/reference/cdcsdk-server/cdcsdk-server-core/src/main/java/com/yugabyte/cdcsdk/server/Main.java:11-17,
ServerApp.java:131-235). Here: argparse → EngineConfig → CdcEngine; the
CLI owns the Ray session (entry()/queries() never do).

    python -m cdcsdk_server_ray run --lake /tmp/lake --keys 10000
    python -m cdcsdk_server_ray state --lake /tmp/lake --limit 5
    python -m cdcsdk_server_ray lineage --lake /tmp/lake
    python -m cdcsdk_server_ray compact --lake /tmp/lake
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

# shell-exportable names only — the same screen ServerApp applies before
# munging (ServerApp.java:234 SHELL_PROPERTY_NAME_PATTERN)
_SHELL_NAME = re.compile(r"^[A-Z0-9_]+$")


def env_to_properties(environ=None,
                      old_prefix: str = "cdcsdk.server.") -> dict[str, str]:
    """``ServerApp.configToProperties`` analogue (ServerApp.java:237-253):
    shell-style env names are lowercased with ``_`` → ``.``; names under
    ``old_prefix`` are re-rooted to flat property names. So
    ``CDCSDK_SERVER_WINDOW_LSNS=500`` → ``{"window.lsns": "500"}`` — the
    container-deployment config path (the reference's compose files set
    everything this way, perf/cdcsdk-base.yaml)."""
    if environ is None:
        environ = os.environ
    props: dict[str, str] = {}
    for name, val in environ.items():
        if not _SHELL_NAME.match(name):
            continue
        prop = name.replace("_", ".").lower()
        if prop.startswith(old_prefix):
            props[prop[len(old_prefix):]] = val
    return props


def apply_env_defaults(parser: argparse.ArgumentParser,
                       environ=None) -> dict:
    """Fold ``CDCSDK_SERVER_*`` env config into a subparser's DEFAULTS —
    same precedence as the reference (env < explicit flag: Quarkus'
    config-source ordering puts command-line above environment).
    Property ``window.lsns`` binds to the argparse dest ``window_lsns``;
    values are coerced through the option's declared ``type`` (flags like
    --incremental-snapshot take the usual truthy strings). Unknown
    properties are ignored, matching configToProperties' pass-through
    spirit (we have no downstream Properties bag to forward them to)."""
    props = env_to_properties(environ)
    actions = {a.dest: a for a in parser._actions}
    applied: dict = {}
    for prop, val in props.items():
        dest = prop.replace(".", "_")
        act = actions.get(dest)
        if act is None:
            continue
        if act.const is True:                       # store_true flag
            applied[dest] = val.strip().lower() in ("1", "true", "yes", "on")
        elif act.type is not None:
            try:
                applied[dest] = act.type(val)
            except (TypeError, ValueError) as e:
                raise SystemExit(
                    f"invalid value for CDCSDK_SERVER_"
                    f"{prop.upper().replace('.', '_')}: {val!r} ({e})")
        else:
            applied[dest] = val
        # set_defaults bypasses argparse's choices check — enforce it
        # here, or CDCSDK_SERVER_SNAPSHOT_MODE=Initial would silently
        # stream with NO snapshot instead of refusing
        if act.choices is not None and applied[dest] not in act.choices:
            raise SystemExit(
                f"invalid value for CDCSDK_SERVER_"
                f"{prop.upper().replace('.', '_')}: {applied[dest]!r} "
                f"(choose from {sorted(act.choices)})")
    if applied:
        parser.set_defaults(**applied)
        for dest in applied:
            # a required option satisfied by env config stays optional on
            # the command line (CDCSDK_SERVER_LAKE alone must suffice —
            # the compose files pass NO flags)
            actions[dest].required = False
    return applied


def _ray_session(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cdcsdk_server_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="tail the changelog into the lake")
    run_p.add_argument("--lake", required=True)
    run_p.add_argument("--keys", type=int, default=10_000)
    run_p.add_argument("--versions", type=int, default=8)
    run_p.add_argument("--partitions", type=int, default=32)
    run_p.add_argument("--window-lsns", type=int, default=0,
                       help="0 = one window over the whole LSN space")
    run_p.add_argument("--max-windows", type=int, default=None)
    run_p.add_argument("--until-lsn", type=int, default=None)
    run_p.add_argument("--exchange", choices=["staged", "groupby"],
                       default="staged")
    run_p.add_argument("--source-table", default="",
                       help="path to a Parquet table to derive the changelog"
                            " from (insert/update/delete rounds) instead of"
                            " the synthetic WAL")
    run_p.add_argument("--snapshot-mode", choices=["never", "initial"],
                       default="never",
                       help="initial = bulk-load the source table before"
                            " streaming (table source only)")
    run_p.add_argument("--start-lsn", type=int, default=0,
                       help="fresh-lake attach point: stream starts AFTER"
                            " this LSN (pair with --incremental-snapshot"
                            " to backfill the skipped range)")
    run_p.add_argument("--incremental-snapshot", action="store_true",
                       help="Debezium/DBLog ad-hoc snapshot: backfill the"
                            " source table in chunks interleaved with"
                            " stream windows (table source only)")
    run_p.add_argument("--snapshot-chunk-rows", type=int, default=4096)
    run_p.add_argument("--dlq-max-content-bytes", type=int, default=None,
                       help="route events with content larger than this "
                       "to dlq/ fragments (exactly-once dead-letter "
                       "stream) instead of applying them")

    for name in ("state", "lineage", "compact", "status"):
        sp = sub.add_parser(name)
        sp.add_argument("--lake", required=True)
        if name == "state":
            sp.add_argument("--limit", type=int, default=10)

    hp = sub.add_parser("serve-health",
                        help="loopback /q/health + /q/metrics endpoint")
    hp.add_argument("--lake", required=True)
    hp.add_argument("--port", type=int, default=8080)

    # CDCSDK_SERVER_* env config becomes run-subcommand DEFAULTS (env <
    # explicit flag) — the reference's container config path (E9)
    apply_env_defaults(run_p)

    args = p.parse_args(argv)
    if args.cmd == "serve-health":        # no Ray session needed
        from cdcsdk_server_ray.health import HealthServer
        srv = HealthServer(args.lake, port=args.port).start()
        print(json.dumps({"serving": f"http://127.0.0.1:{srv.port}/q/health"}))
        try:
            srv._thread.join()
        except KeyboardInterrupt:
            srv.stop()
        return 0
    ray = _ray_session(args.num_cpus)

    from cdcsdk_server_ray.config import EngineConfig, SynthConfig
    from cdcsdk_server_ray.engine import CdcEngine

    try:
        if args.cmd == "run":
            synth = SynthConfig(num_keys=args.keys, max_versions=args.versions)
            if args.source_table:
                from cdcsdk_server_ray.sources.source_table import OFFSET
                cfg = EngineConfig(
                    lake_dir=args.lake, num_partitions=args.partitions,
                    window_lsns=args.window_lsns or OFFSET,
                    source="table", source_table=args.source_table,
                    exchange=args.exchange,
                    snapshot_mode=args.snapshot_mode,
                    start_lsn=args.start_lsn,
                    incremental_snapshot=args.incremental_snapshot,
                    snapshot_chunk_rows=args.snapshot_chunk_rows,
                    dlq_max_content_bytes=args.dlq_max_content_bytes)
            else:
                cfg = EngineConfig(
                    lake_dir=args.lake, num_partitions=args.partitions,
                    window_lsns=args.window_lsns or synth.max_lsn,
                    synth=synth, exchange=args.exchange,
                    dlq_max_content_bytes=args.dlq_max_content_bytes)
            m = CdcEngine(cfg).run(until_lsn=args.until_lsn,
                                   max_windows=args.max_windows)
            print(json.dumps({
                "epoch": m.epoch, "committed_lsn": m.committed_lsn,
                "events_applied": sum(ps.events_applied
                                      for ps in m.partitions.values()),
                "fragments": len(m.all_fragments()),
            }))
        else:
            # state/lineage/compact need the lake's own partition count
            from cdcsdk_server_ray.state.manifest import load_current_manifest
            m = load_current_manifest(args.lake)
            if m is None:
                print("no checkpoint at", args.lake, file=sys.stderr)
                return 1
            cfg = EngineConfig(lake_dir=args.lake,
                               num_partitions=m.num_partitions)
            eng = CdcEngine(cfg)
            if args.cmd == "state":
                df = eng.current_state().to_pandas()
                df = df.sort_values(["repo", "path"]).head(args.limit)
                print(df.to_string(max_colwidth=40))
            elif args.cmd == "lineage":
                from cdcsdk_server_ray.state.lineage import read_lineage
                lin = read_lineage(args.lake).to_pandas()
                print(lin.groupby("partition_id")[
                    ["events_applied", "dedup_drops", "bytes_written",
                     "keys_touched"]].sum().to_string())
            elif args.cmd == "compact":
                m2 = eng.compact()
                print(json.dumps({"epoch": m2.epoch,
                                  "fragments": len(m2.all_fragments())}))
            elif args.cmd == "status":
                # ≙ /q/health (ConnectorLifecycle.java:103-117): liveness =
                # a committed checkpoint; readiness = lag vs the source
                print(json.dumps({
                    "live": True,
                    "epoch": m.epoch,
                    "committed_lsn": m.committed_lsn,
                    "partitions": m.num_partitions,
                    "fragments": len(m.all_fragments()),
                    "events_applied": sum(ps.events_applied
                                          for ps in m.partitions.values()),
                    "dedup_drops": sum(ps.dedup_drops
                                       for ps in m.partitions.values()),
                    "bytes_written": sum(ps.bytes_written
                                         for ps in m.partitions.values()),
                }))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
