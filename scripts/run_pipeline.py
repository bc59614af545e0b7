"""spark-submit launcher (north rule: ships as --py-files package).

    zip -r pkg.zip sems_event_deduplication_spark
    spark-submit --master <master> --py-files pkg.zip \
        scripts/run_pipeline.py --input <table> --warehouse <dir> [...]

The package's ``main`` uses relative imports, so spark-submit needs
this thin absolute-import shim as the primary resource; ``--py-files``
puts the zip on both driver and executor ``sys.path``.
Smoke-tested end to end in ``tests/test_submit.py``.
"""

from sems_event_deduplication_spark.main import main

if __name__ == "__main__":
    main()
