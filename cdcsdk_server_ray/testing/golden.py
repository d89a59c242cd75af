"""Golden record-then-verify harness for arbitrary pipelines.

Reference analogue: ``ConnectorOutputTest``
(/root/reference/cdcsdk-engine/src/test/java/com/yugabyte/cdcsdk/engine/ConnectorOutputTest.java:76-170)
— run a connector, RECORD its output as a JSON fixture on first run,
VERIFY byte-level equality on every later run, with two escape hatches
for legitimate run-to-run variation:

- **ignored fields**: columns whose values change each run (wall-clock
  timestamps, transaction ids) are masked to ``<ignored>`` on BOTH
  sides before compare;
- **``${variable}`` substitution**: fixture values may embed
  ``${name}`` placeholders; verify-time variables fill them in (the
  reference's server_uuid/GTID mechanism), and record-time variables
  reverse-substitute known values back into placeholders so the
  recorded fixture is environment-independent.

The reference's *restart command* is covered by recording/verifying a
SEQUENCE of legs: each leg is one pipeline run (e.g. an engine run up
to ``max_windows`` then a resume); leg boundaries are part of the
fixture, so a resume that replays or skips records fails the compare.

Results may be a Ray ``Dataset``, pandas ``DataFrame`` or Arrow
``Table``; rows are serialized with the sink family's canonical JSON
line form (column order = schema order), so a fixture recorded from a
pipeline is exactly what the JSONL sink would have shipped.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa

_RESTART = "---restart---"                  # leg-boundary marker line
_IGNORED = "<ignored>"
_VAR_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _to_table(result) -> pa.Table:
    if isinstance(result, pa.Table):
        return result
    try:
        import pandas as pd
        if isinstance(result, pd.DataFrame):
            return pa.Table.from_pandas(result, preserve_index=False)
    except ImportError:
        pass
    import ray

    tables = [t for t in ray.get(result.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


class GoldenHarness:
    """Record-or-verify one pipeline's output against a JSONL fixture."""

    def __init__(self, fixture_path: str, *,
                 ignored_fields: tuple[str, ...] = (),
                 variables: dict[str, str] | None = None):
        self.fixture_path = fixture_path
        self.ignored_fields = tuple(ignored_fields)
        self.variables = dict(variables or {})

    # -- serialization ------------------------------------------------------
    def _lines(self, result) -> list[str]:
        from cdcsdk_server_ray.sinks.base import BaseSink

        t = _to_table(result)
        if t.num_rows == 0:
            return []
        for col in self.ignored_fields:
            if col in t.column_names:
                i = t.column_names.index(col)
                t = t.set_column(i, col, pa.nulls(t.num_rows, pa.string())
                                 .fill_null(_IGNORED))
        return BaseSink.to_json_lines(t).to_pylist()

    def _substitute(self, line: str) -> str:
        return _VAR_RE.sub(
            lambda m: self.variables.get(m.group(1), m.group(0)), line)

    def _reverse_substitute(self, line: str) -> str:
        for name, value in self.variables.items():
            if value:
                line = line.replace(value, "${%s}" % name)
        return line

    # -- record / verify ----------------------------------------------------
    def exists(self) -> bool:
        return os.path.exists(self.fixture_path)

    def record(self, *legs) -> None:
        """Write the fixture from one or more result legs (atomic)."""
        out = []
        for i, leg in enumerate(legs):
            if i:
                out.append(_RESTART)
            out.extend(self._reverse_substitute(line)
                       for line in self._lines(leg))
        os.makedirs(os.path.dirname(self.fixture_path) or ".",
                    exist_ok=True)
        tmp = f"{self.fixture_path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("\n".join(out) + ("\n" if out else ""))
        os.replace(tmp, self.fixture_path)

    def expected_legs(self) -> list[list[str]]:
        with open(self.fixture_path) as f:
            raw = f.read().splitlines()
        legs: list[list[str]] = [[]]
        for line in raw:
            if line == _RESTART:
                legs.append([])
            else:
                legs[-1].append(self._substitute(line))
        return legs

    def verify(self, *legs) -> None:
        """Compare result legs to the fixture; raises AssertionError with
        the first differing line (or a leg-shape mismatch)."""
        expected = self.expected_legs()
        if len(expected) != len(legs):
            raise AssertionError(
                f"fixture has {len(expected)} legs, got {len(legs)} "
                "(a restart boundary moved)")
        for li, (exp, leg) in enumerate(zip(expected, legs)):
            got = self._lines(leg)
            if len(exp) != len(got):
                raise AssertionError(
                    f"leg {li}: expected {len(exp)} records, got "
                    f"{len(got)}")
            for ri, (e, g) in enumerate(zip(exp, got)):
                if e != g:
                    raise AssertionError(
                        f"leg {li} record {ri} differs:\n"
                        f"  expected: {e}\n  actual:   {g}")

    def record_or_verify(self, *legs) -> str:
        """The ConnectorOutputTest flow: first run records the fixture
        and returns 'recorded'; later runs verify and return 'verified'."""
        if not self.exists():
            self.record(*legs)
            return "recorded"
        self.verify(*legs)
        return "verified"
