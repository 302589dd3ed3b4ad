

def test_parse_where_grammar():
    from denali_spark.sources.expressions import parse_where, to_spark_sql

    cases = {
        "a = 5": "(`a` = 5)",
        "a <> 'x''y'": "(`a` != 'x''y')",
        "(a < 1 OR b >= 2.5) AND c IS NOT NULL":
            "(((`a` < 1) OR (`b` >= 2.5)) AND (`c` IS NOT NULL))",
        "k IN (1, 2, 3)": "(`k` IN (1, 2, 3))",
        "d NOT IN ('a', 'b')": "(`d` NOT IN ('a', 'b'))",
        "d BETWEEN 2 AND 9": "((`d` >= 2) AND (`d` <= 9))",
        "ts >= TIMESTAMP '2024-01-01 00:00:00'":
            "(`ts` >= '2024-01-01 00:00:00')",
        "day = DATE '2024-06-01'": "(`day` = '2024-06-01')",
        "NOT (a = 1)": "(NOT (`a` = 1))",
        "flag IS NULL": "(`flag` IS NULL)",
    }
    for text, expected in cases.items():
        assert to_spark_sql(parse_where(text)) == expected, text


def test_parse_where_rejects_garbage():
    import pytest

    from denali_spark.sources.expressions import parse_where

    for bad in ["a = ", "= 5", "a LIKE 'x%'", "a = 5 OR", "a = 5 extra junk",
                "f(a) = 1", "a = b"]:
        with pytest.raises(ValueError):
            parse_where(bad)

