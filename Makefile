.PHONY: test test-fast parity parity-sf001 bench smoke

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

parity:          ## oracle parity at the correctness gate's scale factor
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py -q

parity-sf001:
	python -m pytest tests/test_oracle_parity.py -q

bench:           ## one JSON line at $$SPARK_GRAFT_SF_DIR (default sf0.1)
	python bench.py

smoke:           ## driver-shaped smoke: entry() under a vanilla session
	python -c "from pyspark.sql import SparkSession; \
	import __spark_entry__ as E; \
	s = SparkSession.builder.master('local[4]').getOrCreate(); \
	print(E.entry(s).collect())"
