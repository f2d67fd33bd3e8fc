from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.log import (  # noqa: F401
    CommitConflictError,
    DistributedWriterError,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import (  # noqa: F401
    DirtyBranchError,
    LakeRepo,
    MergeConflict,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL  # noqa: F401
