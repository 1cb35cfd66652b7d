from driftdb_spark.cli import main

raise SystemExit(main())
