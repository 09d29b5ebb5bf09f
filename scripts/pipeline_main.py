"""spark-submit entry point: the package itself arrives via --py-files,
so this launcher only needs to import and dispatch (a file run by
spark-submit has no package context for relative imports)."""

from morph_xr2rml_spark.pipeline.run import main

if __name__ == "__main__":
    main()
