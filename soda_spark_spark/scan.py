"""Migration-compatibility module: mirrors the reference's import surface so
`from sodaspark import scan` code ports with a module swap
(`from soda_spark_spark import scan`). Name-for-name equivalents of the
reference's public functions (/root/reference/src/sodaspark/scan.py):

- scan.execute(scan_definition, df, variables=..., warehouse_name=...,
  soda_server_client=..., as_frames=..., time=...)   (A1, scan.py:424-474)
- scan.create_scan_yml(...)                           (A3, scan.py:204-233)
- scan.measurements_to_data_frame / test_results_to_data_frame /
  scan_errors_to_data_frame                           (A13-A15)

The DB-API shim (Connection/Cursor, A6-A11) and the dialect layer (A12) have
no equivalent by design — the engine compiles scans to native DataFrame
operations, so there is no SQL string to route through a cursor
(SURVEY.md §1.4: "delete entirely").
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame

from .api import execute as _execute
from .plans.definition import ScanDefinition, create_scan_definition
from .publish import publish
from .results import (
    ScanResult,
    measurements_to_data_frame,
    scan_errors_to_data_frame,
    scan_result_to_data_frames,
    test_results_to_data_frame,
)

__all__ = [
    "execute",
    "create_scan_yml",
    "create_scan_definition",
    "measurements_to_data_frame",
    "test_results_to_data_frame",
    "scan_errors_to_data_frame",
    "scan_result_to_data_frames",
]

# A3: the reference's name for scan-definition loading
create_scan_yml = create_scan_definition


def execute(
    scan_definition: str | Path | dict,
    df: DataFrame,
    *,
    variables: dict[str, Any] | None = None,
    warehouse_name: str = "soda_spark_spark",
    soda_server_client: Any | None = None,
    as_frames: bool = False,
    time: str | None = None,
) -> ScanResult | tuple[DataFrame, DataFrame, DataFrame]:
    """Reference-shaped entry point (A1). `soda_server_client` is any object
    with `execute_command(command: dict)` — the reference's SodaServerClient
    satisfies this, as do the local publishers in `publish.py`; scan results
    are pushed through the same command vocabulary the reference used."""
    result = _execute(
        scan_definition,
        df,
        variables=variables,
        time=time,
        warehouse_name=warehouse_name,
    )
    assert isinstance(result, ScanResult)
    if soda_server_client is not None:
        definition = create_scan_definition(scan_definition, variables)
        publish(result, soda_server_client, table_name=definition.table_name)
    if as_frames:
        return scan_result_to_data_frames(result, df.sparkSession)
    return result
