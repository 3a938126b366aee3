"""Configuration for the compaction engine.

Semantics and default values match the reference implementation
(nimtable/iceberg-compaction, `core/src/config/mod.rs`), re-expressed as
Python dataclasses.  Citations are file:line into /root/reference.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

# --- defaults (core/src/config/mod.rs:29-55) -------------------------------
DEFAULT_TARGET_FILE_SIZE = 1024 * 1024 * 1024  # 1 GiB (mod.rs:29)
DEFAULT_MAX_RECORD_BATCH_ROWS = 1024  # (mod.rs:31)
DEFAULT_MAX_ROW_GROUP_BYTES = 128 * 1024 * 1024  # 128 MiB (mod.rs:35)
DEFAULT_COMPRESSION = "zstd"  # writer props (mod.rs:295-303)
DEFAULT_SMALL_FILE_THRESHOLD = 32 * 1024 * 1024  # 32 MiB (mod.rs:39)
DEFAULT_MIN_SIZE_PER_PARTITION = 512 * 1024 * 1024  # 512 MiB (mod.rs:40)
DEFAULT_MAX_FILE_COUNT_PER_PARTITION = 32  # (mod.rs:41)
DEFAULT_MAX_CONCURRENT_COMPACTION_PLANS = 4  # (mod.rs:42)
DEFAULT_MIN_DELETE_FILE_COUNT = 128  # (mod.rs:43)
DEFAULT_TARGET_GROUP_SIZE = 100 * 1024 * 1024 * 1024  # 100 GiB (mod.rs:52)
SPLIT_OVERHEAD = 5 * 1024 * 1024  # 5 MiB per split (mod.rs:55)

# Iceberg-ported output sizing ratios (strategy.rs:335-343) live as
# integer math in plans/parallelism.py: min = target*3//4, max = target*9//5.


class CompactionType(enum.Enum):
    """Which files a run targets (core/src/config/mod.rs:127-292)."""

    FULL = "full"
    SMALL_FILES = "small_files"
    FILES_WITH_DELETES = "files_with_deletes"


class FileGroupScope(enum.Enum):
    """Grouping scope (core/src/config/mod.rs:101-108).

    PARTITION (default): group files within each Iceberg partition.
    TABLE: group across all selected files.
    """

    PARTITION = "partition"
    TABLE = "table"


@dataclass
class WriterConfig:
    """Output-writer knobs (S10/S11; core/src/config/mod.rs:29-35,295-303)."""

    target_file_size_bytes: int = DEFAULT_TARGET_FILE_SIZE
    max_row_group_bytes: int = DEFAULT_MAX_ROW_GROUP_BYTES
    compression: str = DEFAULT_COMPRESSION
    # Spark sizes files by rows, not bytes: estimated average row width is
    # used to translate target bytes -> maxRecordsPerFile (SURVEY.md §7.3).
    estimated_row_size_bytes: int | None = None


@dataclass
class CompactionPlanningConfig:
    """Planning-pipeline knobs (L1-L12).

    Mirrors per-strategy config in core/src/config/mod.rs:127-292.
    """

    compaction_type: CompactionType = CompactionType.SMALL_FILES
    group_scope: FileGroupScope = FileGroupScope.PARTITION

    # L1 SizeFilter (strategy.rs:505-544)
    small_file_threshold_bytes: int = DEFAULT_SMALL_FILE_THRESHOLD
    # L2 DeleteFileCountFilter (strategy.rs:549-583)
    min_delete_file_count: int = DEFAULT_MIN_DELETE_FILE_COUNT
    # L6 BinPack (packer.rs:31-132); 0 => single bin
    target_group_size_bytes: int = DEFAULT_TARGET_GROUP_SIZE
    # L7/L8 group filters (strategy.rs:588-633); None => disabled
    min_group_size_bytes: int | None = None
    min_group_file_count: int | None = None

    # L10 parallelism (strategy.rs:180-343; caps mod.rs:141-147)
    target_file_size_bytes: int = DEFAULT_TARGET_FILE_SIZE
    min_size_per_partition: int = DEFAULT_MIN_SIZE_PER_PARTITION
    max_file_count_per_partition: int = DEFAULT_MAX_FILE_COUNT_PER_PARTITION
    max_input_parallelism: int = 128  # reference: 4 x CPUs
    max_output_parallelism: int = 32  # reference: CPUs


@dataclass
class CommitRetryConfig:
    """Optimistic-commit retry (core/src/compaction/mod.rs:765-782)."""

    max_retries: int = 3
    initial_backoff_s: float = 1.0
    max_backoff_s: float = 10.0


@dataclass
class CompactionConfig:
    """Top-level engine config (core/src/config/mod.rs)."""

    planning: CompactionPlanningConfig = field(default_factory=CompactionPlanningConfig)
    writer: WriterConfig = field(default_factory=WriterConfig)
    retry: CommitRetryConfig = field(default_factory=CommitRetryConfig)
    max_concurrent_compaction_plans: int = DEFAULT_MAX_CONCURRENT_COMPACTION_PLANS
    enable_validate_compaction: bool = False

    @staticmethod
    def small_files(**kw) -> "CompactionConfig":
        return CompactionConfig(
            planning=CompactionPlanningConfig(
                compaction_type=CompactionType.SMALL_FILES, **kw
            )
        )

    @staticmethod
    def full(**kw) -> "CompactionConfig":
        return CompactionConfig(
            planning=CompactionPlanningConfig(compaction_type=CompactionType.FULL, **kw)
        )

    @staticmethod
    def files_with_deletes(**kw) -> "CompactionConfig":
        return CompactionConfig(
            planning=CompactionPlanningConfig(
                compaction_type=CompactionType.FILES_WITH_DELETES, **kw
            )
        )
