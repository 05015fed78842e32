"""Test-support datasource for the crash-point sweep in test_pyds.py.

Lives in its own importable module (not inside the test file) because
Spark pickles DataSource classes by reference and resolves them in
separate Python worker processes — the test ships this file to them via
``sparkContext.addPyFile``. The writer raises ONCE at the configured
commit-protocol stage through the production writer's ``_crash_hook``
seam, so every protocol line executed is the real one.
"""

from __future__ import annotations

import os

from project_etl_spark.pyds import RunFilesDataSource, RunFilesStreamWriter


class InjectedCrash(RuntimeError):
    pass


class CrashyStreamWriter(RunFilesStreamWriter):
    def __init__(self, options):
        super().__init__(options)
        self.crash_point = options.get("crash_point", "")
        self.marker = options.get("crash_marker", "")

    def _crash_hook(self, stage):
        if (self.crash_point == stage and self.marker
                and not os.path.exists(self.marker)):
            with open(self.marker, "w") as fh:
                fh.write(stage)
            raise InjectedCrash(f"injected driver crash at {stage}")


class CrashyRunFilesDataSource(RunFilesDataSource):
    @classmethod
    def name(cls):
        return "etl_runfiles_crashy"

    def streamWriter(self, schema, overwrite):
        return CrashyStreamWriter(self.options)
