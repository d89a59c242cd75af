"""cdcsdk_server_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch rebuild of the capabilities of yugabyte/cdcsdk-server
(reference: /root/reference, a Quarkus/Debezium embedded-engine runner)
re-expressed Ray-Data-first:

- change events are rows of Arrow record batches flowing through
  ``ray.data.Dataset.map_batches(fn, batch_format="pyarrow")`` chains
  (reference: row-at-a-time SMT chain, cdcsdk-engine/.../Transformations.java:74-82);
- the poll→transform→deliver loop (MTEngine.java:879-934) becomes a
  windowed driver loop over the LSN axis (engine.py);
- sink consumers + offset store (BaseChangeConsumer.java, MTEngine.java:1098-1138)
  become an exactly-once Parquet-lake upsert with a two-phase commit
  manifest (state/lake.py, state/manifest.py);
- tablet/task sharding (ServerApp.java:192-234) becomes explicit hash
  partitioning of the (repo, path) key space (stages/partition.py).
"""

from cdcsdk_server_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"


def _register_pickle_by_value() -> None:
    """Ship this package's code inside pickled closures.

    The engine may be driven by a process that called ``ray.init()``
    before this package's directory was on ``PYTHONPATH``; Ray workers
    then cannot import ``cdcsdk_server_ray`` by reference. Registering
    the package (and its submodules) with cloudpickle's by-value mode
    makes every ``map_batches`` closure self-contained — the idiomatic
    fix for "module not found on worker" without a runtime_env.
    """
    import importlib
    import pkgutil
    import sys

    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover - ray always present in this env
        return
    pkg = sys.modules[__name__]
    try:
        cloudpickle.register_pickle_by_value(pkg)
    except Exception:
        return
    for mod in pkgutil.walk_packages(pkg.__path__, prefix=__name__ + "."):
        try:
            m = importlib.import_module(mod.name)
            cloudpickle.register_pickle_by_value(m)
        except Exception:
            pass


_register_pickle_by_value()
