"""Unit tests for DeletionCriteria / EngineConfig validation and the
criteria→Column compiler (reference: DeletionCriteria.java:95-131,
JobConfig.java:132-165)."""

from datetime import datetime

import pytest

from bd_delete_records_from_external_hive_table_spark.config import (
    CriteriaValidationError,
    DeletionCriteria,
    EngineConfig,
)


def _crit(**kw) -> DeletionCriteria:
    return DeletionCriteria(**kw)


def test_requires_at_least_one_condition():
    with pytest.raises(CriteriaValidationError):
        _crit()


def test_start_must_precede_end():
    with pytest.raises(CriteriaValidationError):
        _crit(start_time=datetime(2026, 1, 2), end_time=datetime(2026, 1, 1))
    with pytest.raises(CriteriaValidationError):
        _crit(start_time=datetime(2026, 1, 1), end_time=datetime(2026, 1, 1))


def test_injection_screen():
    # the reference's forbidden substrings (DeletionCriteria.java:117-131)
    for bad in ["id = 5; drop table x", "id = 5 -- comment",
                "1=1 /* hack */", "exec xp_cmdshell", "drop table t"]:
        with pytest.raises(CriteriaValidationError):
            _crit(where_clause=bad)
    # benign clause passes
    _crit(where_clause="status = 'INACTIVE'")


def test_time_column_required_with_window():
    with pytest.raises(CriteriaValidationError):
        _crit(start_time=datetime(2026, 1, 1), time_column="")


def test_describe():
    c = _crit(where_clause="id = 5",
              start_time=datetime(2026, 1, 1),
              end_time=datetime(2026, 2, 1),
              time_column="ts")
    d = c.describe()
    assert "ts >=" in d and "ts <" in d and "(id = 5)" in d


def test_engine_config_validation():
    crit = _crit(where_clause="id = 1")
    with pytest.raises(CriteriaValidationError):
        EngineConfig(database="", table="t", criteria=crit)
    with pytest.raises(CriteriaValidationError):
        EngineConfig(database="db", table="t", criteria=crit,
                     backup_strategy="nope")
    with pytest.raises(CriteriaValidationError):
        EngineConfig(database="db", table="t", criteria=crit,
                     backup_strategy="path")  # needs backup_location
    cfg = EngineConfig(database="db", table="t", criteria=crit,
                       backup_enabled=False)
    assert cfg.qualified_table == "db.t"


def test_criteria_compiles_on_testdata(spark, sf_dir):
    """P3/P4/P5 compiled predicates agree with SQL on real data."""
    from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("ev")
    c = _crit(where_clause="event_type = 'click'",
              start_time=datetime(2024, 1, 10),
              end_time=datetime(2024, 1, 20),
              time_column="ts")
    n_pred = events.where(c.to_column()).count()
    n_sql = spark.sql(
        "SELECT COUNT(*) FROM ev WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-20 00:00:00' "
        "AND (event_type = 'click')").first()[0]
    assert n_pred == n_sql
    # retention complement partitions the table (no NULLs in this predicate)
    n_ret = events.where(c.retention_column()).count()
    assert n_pred + n_ret == events.count()
