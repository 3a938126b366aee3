"""Post-compaction row-count validation (A1).

The reference re-executes the input MOR query and scans the output files,
comparing total row counts (CompactionValidator,
core/src/compaction/validator.rs:127-177).  Spark mapping: two ``count()``
jobs — count() is a map-side partial aggregate, so even at 100 TB it
moves one long per task.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


class ValidationError(RuntimeError):
    pass


@dataclass
class ValidationResult:
    input_rows: int
    output_rows: int

    @property
    def ok(self) -> bool:
        return self.input_rows == self.output_rows


def validate_row_counts(
    input_df: DataFrame, output_df: DataFrame, raise_on_mismatch: bool = True
) -> ValidationResult:
    res = ValidationResult(input_rows=input_df.count(), output_rows=output_df.count())
    if raise_on_mismatch and not res.ok:
        raise ValidationError(
            f"row count mismatch after compaction: input={res.input_rows} "
            f"output={res.output_rows}"
        )
    return res
