from bela_spark.sources.repo_files import (  # noqa: F401
    REPO_FILES_COLUMNS,
    read_repo_files,
    read_repo_files_stream,
    write_bucketed,
    write_repo_files,
)
