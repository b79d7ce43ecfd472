from tulflow_spark.cli import main

raise SystemExit(main())
