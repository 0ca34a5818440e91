.PHONY: test quick bench verify scale explains queries-doc

test:
	python -m pytest tests/ -q

# pre-commit tier (<4 min): every fast invariant test + one parity
# representative per operator family (tests/conftest.py)
quick:
	python -m pytest tests/ -m quick -q

bench:
	python bench.py

# mirror of the driver's correctness gate (plain session + DuckDB oracles)
verify:
	python -m pytest tests/test_oracle_parity.py -q

scale:
	SPARK_GRAFT_SCALE_TEST=1 python -m pytest tests/test_scale_smoke.py -q

explains:
	python tools/gen_explains.py

queries-doc:
	python tools/gen_queries_md.py
