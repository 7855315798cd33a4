# gorilla_stream_spark — common targets (analog of the reference's Makefile)

.PHONY: test oracles bench scaling ship smoke

test:
	python -m pytest tests/ -x -q

oracles:
	python scripts/check_oracles.py

bench:
	python bench.py

scaling:
	python scripts/bench_scaling.py

scaling-neardup:
	python scripts/bench_neardup_scaling.py

ship:
	rm -f engine.zip && zip -qr engine.zip gorilla_stream_spark
	@echo "spark-submit --py-files engine.zip gorilla_stream_spark/jobs.py encode --input ... --output ... --checkpoint ..."
	@echo "spark-submit --py-files engine.zip gorilla_stream_spark/jobs.py pipeline --input ... --workdir ... --output ... --stages clean,dedup,encode"

smoke:
	python -c "import __spark_entry__ as e; \
from gorilla_stream_spark.session import get_spark; \
s = get_spark(master='local[4]'); s.sparkContext.setLogLevel('ERROR'); \
df = e.entry(s); df.show(); s.stop()"
