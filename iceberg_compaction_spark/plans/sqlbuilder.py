"""Debug SQL emitter mirroring the reference's ``SqlBuilder``.

The reference engine's only query shape is one generated MOR SQL string
(core/src/executor/datafusion/datafusion_processor.rs:438-584).  Our
engine executes the equivalent logical plan through the DataFrame API
(operators/mor.py), but we keep a string emitter that reproduces the
reference's output byte-for-byte:

- as a debugging/explain surface (``CompactionPlan -> SQL``);
- so the reference's golden SQL unit tests (datafusion_processor.rs:
  1071-1333, 1462-2027) carry over verbatim as our golden tests,
  pinning join order, hidden-column plumbing, aliasing, and identifier
  quoting.

Shape: innermost data-file subquery (projected columns + hidden
columns), optionally RIGHT ANTI JOIN against the position-delete table,
then one RIGHT ANTI JOIN per equality-delete table in file order, then
an outer projection stripping hidden columns aliased "final_result".
"""

from __future__ import annotations

from dataclasses import dataclass

SYS_HIDDEN_SEQ_NUM = "sys_hidden_seq_num"
SYS_HIDDEN_FILE_PATH = "sys_hidden_file_path"
SYS_HIDDEN_POS = "sys_hidden_pos"

DATA_FILE_TABLE = "_data_file_table"
POSITION_DELETE_TABLE = "_position_delete_table"


def quote_identifier(identifier: str) -> str:
    """Double-quote an identifier, doubling embedded quotes (keyword- and
    injection-proof; datafusion_processor.rs:387-411)."""
    return '"' + identifier.replace('"', '""') + '"'


@dataclass(frozen=True)
class EqualityDeleteMetadata:
    """One equality-delete table: its key column names + table name.

    (The reference carries an Iceberg schema whose non-hidden fields are
    the equality key columns; we carry the names directly.)
    """

    equality_columns: tuple[str, ...]
    table_name: str


@dataclass
class SqlBuilder:
    project_names: list[str]
    position_delete_table: str | None
    data_file_table: str
    equality_delete_metadatas: list[EqualityDeleteMetadata]
    need_file_path_and_pos: bool

    def _hidden_columns(self) -> list[str]:
        cols: list[str] = []
        if self.equality_delete_metadatas:
            cols.append(SYS_HIDDEN_SEQ_NUM)
        if self.need_file_path_and_pos:
            cols.extend([SYS_HIDDEN_FILE_PATH, SYS_HIDDEN_POS])
        return cols

    def build_merge_on_read_sql(self) -> str:
        q = quote_identifier
        data_tbl = q(self.data_file_table)
        hidden = self._hidden_columns()
        proj_hidden = ", ".join(q(c) for c in [*self.project_names, *hidden])
        proj_final = ", ".join(q(c) for c in self.project_names)

        if not hidden:
            return f"SELECT {proj_final} FROM {data_tbl}"

        # innermost: the data-file scan with hidden columns
        inner = f"SELECT {proj_hidden} FROM {data_tbl}"

        # position-delete anti-join (innermost join level)
        if self.need_file_path_and_pos and self.position_delete_table:
            pos_tbl = q(self.position_delete_table)
            on = (
                f"{data_tbl}.{q(SYS_HIDDEN_FILE_PATH)} = {pos_tbl}.{q(SYS_HIDDEN_FILE_PATH)}"
                f" AND {data_tbl}.{q(SYS_HIDDEN_POS)} = {pos_tbl}.{q(SYS_HIDDEN_POS)}"
            )
            inner = (
                f"SELECT {proj_hidden} FROM {pos_tbl} RIGHT ANTI JOIN "
                f"({inner}) AS {data_tbl} ON {on}"
            )

        # one anti-join per equality-delete table, in file order (left-deep)
        for meta in self.equality_delete_metadatas:
            eq_tbl = q(meta.table_name)
            conds = [
                f"{eq_tbl}.{q(c)} = {data_tbl}.{q(c)}"
                for c in meta.equality_columns
            ]
            conds.append(
                f"{data_tbl}.{q(SYS_HIDDEN_SEQ_NUM)} < {eq_tbl}.{q(SYS_HIDDEN_SEQ_NUM)}"
            )
            inner = (
                f"SELECT {proj_hidden} FROM {eq_tbl} RIGHT ANTI JOIN "
                f"({inner}) AS {data_tbl} ON {' AND '.join(conds)}"
            )

        return f"SELECT {proj_final} FROM ({inner}) AS {q('final_result')}"
