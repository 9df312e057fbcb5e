from excelastic_ray.analysis import query_terms, tokenize, tokenize_many


def test_tokenize_basic():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("rare_tok_7 and 42nd") == ["rare_tok_7", "and", "42nd"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_tokenize_many():
    assert tokenize_many(["A b", None, ""]) == [["a", "b"], [], []]


def test_query_terms_sorted_dedup():
    assert query_terms("zebra apple zebra") == ["apple", "zebra"]
