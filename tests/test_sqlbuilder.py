"""Golden SQL-string tests carried over from the reference's SqlBuilder
unit tests (datafusion_processor.rs:1462-2027, 1267-1333).  Expected
strings are byte-for-byte the reference's goldens."""

from iceberg_compaction_spark.plans.sqlbuilder import (
    DATA_FILE_TABLE,
    POSITION_DELETE_TABLE,
    EqualityDeleteMetadata,
    SqlBuilder,
    quote_identifier,
)


def test_no_deletes_no_hidden_columns():
    b = SqlBuilder(["id", "name"], None, DATA_FILE_TABLE, [], False)
    assert b.build_merge_on_read_sql() == 'SELECT "id", "name" FROM "_data_file_table"'


def test_position_deletes_only():
    b = SqlBuilder(["id", "name"], POSITION_DELETE_TABLE, DATA_FILE_TABLE, [], True)
    expected = (
        'SELECT "id", "name" FROM (SELECT "id", "name", "sys_hidden_file_path", '
        '"sys_hidden_pos" FROM "_position_delete_table" RIGHT ANTI JOIN '
        '(SELECT "id", "name", "sys_hidden_file_path", "sys_hidden_pos" FROM '
        '"_data_file_table") AS "_data_file_table" ON '
        '"_data_file_table"."sys_hidden_file_path" = '
        '"_position_delete_table"."sys_hidden_file_path" AND '
        '"_data_file_table"."sys_hidden_pos" = '
        '"_position_delete_table"."sys_hidden_pos") AS "final_result"'
    )
    assert b.build_merge_on_read_sql() == expected


def test_equality_deletes_only():
    eq = EqualityDeleteMetadata(("id",), "_equality_delete_table_0")
    b = SqlBuilder(["id", "name"], None, DATA_FILE_TABLE, [eq], False)
    expected = (
        'SELECT "id", "name" FROM (SELECT "id", "name", "sys_hidden_seq_num" '
        'FROM "_equality_delete_table_0" RIGHT ANTI JOIN (SELECT "id", "name", '
        '"sys_hidden_seq_num" FROM "_data_file_table") AS "_data_file_table" ON '
        '"_equality_delete_table_0"."id" = "_data_file_table"."id" AND '
        '"_data_file_table"."sys_hidden_seq_num" < '
        '"_equality_delete_table_0"."sys_hidden_seq_num") AS "final_result"'
    )
    assert b.build_merge_on_read_sql() == expected


def test_combined_pos_and_eq_deletes():
    """The most complex nesting (datafusion_processor.rs:1500-1511)."""
    eq = EqualityDeleteMetadata(("id",), "_equality_delete_table_0")
    b = SqlBuilder(
        ["id", "item_name", "description"],
        POSITION_DELETE_TABLE,
        DATA_FILE_TABLE,
        [eq],
        True,
    )
    expected = (
        'SELECT "id", "item_name", "description" FROM (SELECT "id", "item_name", '
        '"description", "sys_hidden_seq_num", "sys_hidden_file_path", '
        '"sys_hidden_pos" FROM "_equality_delete_table_0" RIGHT ANTI JOIN '
        '(SELECT "id", "item_name", "description", "sys_hidden_seq_num", '
        '"sys_hidden_file_path", "sys_hidden_pos" FROM "_position_delete_table" '
        'RIGHT ANTI JOIN (SELECT "id", "item_name", "description", '
        '"sys_hidden_seq_num", "sys_hidden_file_path", "sys_hidden_pos" FROM '
        '"_data_file_table") AS "_data_file_table" ON '
        '"_data_file_table"."sys_hidden_file_path" = '
        '"_position_delete_table"."sys_hidden_file_path" AND '
        '"_data_file_table"."sys_hidden_pos" = '
        '"_position_delete_table"."sys_hidden_pos") AS "_data_file_table" ON '
        '"_equality_delete_table_0"."id" = "_data_file_table"."id" AND '
        '"_data_file_table"."sys_hidden_seq_num" < '
        '"_equality_delete_table_0"."sys_hidden_seq_num") AS "final_result"'
    )
    assert b.build_merge_on_read_sql() == expected


def test_multiple_equality_delete_schemas_nest_left_deep():
    """datafusion_processor.rs:1267-1333 — first table innermost; the
    position-delete join is NOT emitted when need_file_path_and_pos is
    False even if a table name is supplied."""
    eqs = [
        EqualityDeleteMetadata(("id",), "test_1"),
        EqualityDeleteMetadata(("name",), "test_2"),
    ]
    b = SqlBuilder(["id", "name"], POSITION_DELETE_TABLE, DATA_FILE_TABLE, eqs, False)
    expected = (
        'SELECT "id", "name" FROM (SELECT "id", "name", "sys_hidden_seq_num" '
        'FROM "test_2" RIGHT ANTI JOIN (SELECT "id", "name", '
        '"sys_hidden_seq_num" FROM "test_1" RIGHT ANTI JOIN (SELECT "id", '
        '"name", "sys_hidden_seq_num" FROM "_data_file_table") AS '
        '"_data_file_table" ON "test_1"."id" = "_data_file_table"."id" AND '
        '"_data_file_table"."sys_hidden_seq_num" < "test_1"."sys_hidden_seq_num") '
        'AS "_data_file_table" ON "test_2"."name" = "_data_file_table"."name" '
        'AND "_data_file_table"."sys_hidden_seq_num" < '
        '"test_2"."sys_hidden_seq_num") AS "final_result"'
    )
    assert b.build_merge_on_read_sql() == expected


def test_keyword_table_names_are_quoted():
    b = SqlBuilder(["id", "name"], None, "from", [], False)
    assert b.build_merge_on_read_sql() == 'SELECT "id", "name" FROM "from"'


def test_quote_doubling():
    assert quote_identifier('we"ird') == '"we""ird"'
    b = SqlBuilder(['col"umn'], None, 't', [], False)
    assert b.build_merge_on_read_sql() == 'SELECT "col""umn" FROM "t"'


def test_multi_column_equality_keys():
    eq = EqualityDeleteMetadata(("v1", "v2"), "eq0")
    b = SqlBuilder(["v1", "v2", "v3"], None, "d", [eq], False)
    sql = b.build_merge_on_read_sql()
    assert '"eq0"."v1" = "d"."v1" AND "eq0"."v2" = "d"."v2"' in sql
    assert '"d"."sys_hidden_seq_num" < "eq0"."sys_hidden_seq_num"' in sql
