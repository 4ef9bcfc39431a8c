"""Engine-wide constants.

Mirrors the behavioral constants of the reference emulator
(`/root/reference/pkg/config/constants.go:5-56`): default namespace
``TEST_DB.PUBLIC``, Snowflake gosnowflake-protocol statement-type ids,
and default session parameters.
"""

from __future__ import annotations

DEFAULT_DATABASE = "TEST_DB"
DEFAULT_SCHEMA = "PUBLIC"

# Snowflake gosnowflake-protocol statement type ids
# (reference: pkg/config/constants.go:14-20).
STATEMENT_TYPE_SELECT = 1
STATEMENT_TYPE_INSERT = 2
STATEMENT_TYPE_DML = 3
STATEMENT_TYPE_DDL = 4
STATEMENT_TYPE_DROP = 5

QUERY_RESULT_FORMAT_JSON = "json"

# Large-result streaming (r8, beyond reference — the reference fully
# materializes every rowset, pkg/query/executor.go:99-119): a SELECT
# whose row count exceeds the threshold is NOT collect()ed on the
# driver; Result keeps the DataFrame and the protocol layer serializes
# it batch-by-batch from toLocalIterator, so driver memory is bounded
# by one batch regardless of result size.
RESULT_STREAM_THRESHOLD = 100_000
RESULT_STREAM_BATCH = 10_000

# Session identity defaults (beyond reference: the reference accepts
# ACCOUNT_NAME/LOGIN_NAME in the login body — server/types/types.go:16-17 —
# but exposes no context functions; we surface them via
# CURRENT_USER/CURRENT_ACCOUNT/... with these fallbacks when a login
# body did not provide values).
DEFAULT_USER = "EMULATOR"
DEFAULT_ROLE = "ACCOUNTADMIN"
DEFAULT_WAREHOUSE = "COMPUTE_WH"
DEFAULT_ACCOUNT = "EMULATOR"
DEFAULT_REGION = "AWS_US_WEST_2"
# CURRENT_VERSION() shape: Snowflake returns "major.minor.patch"
EMULATOR_VERSION = "8.0.0"

# Session parameter defaults (reference: pkg/config/constants.go:28-56).
DEFAULT_SESSION_PARAMETERS: dict[str, str] = {
    "TIMEZONE": "UTC",
    "TIMESTAMP_OUTPUT_FORMAT": "YYYY-MM-DD HH24:MI:SS",
    "CLIENT_SESSION_KEEP_ALIVE": "false",
    "QUERY_TAG": "",
    "GO_QUERY_RESULT_FORMAT": QUERY_RESULT_FORMAT_JSON,
    # Snowflake's out-of-the-box MERGE is strict: a target row matched
    # by multiple actionable source rows raises rather than silently
    # applying one of them
    "ERROR_ON_NONDETERMINISTIC_MERGE": "TRUE",
}

# Warehouse sizes accepted by CREATE WAREHOUSE
# (reference: pkg/warehouse/manager.go:53-214).
WAREHOUSE_SIZES = (
    "X-SMALL",
    "SMALL",
    "MEDIUM",
    "LARGE",
    "X-LARGE",
    "2X-LARGE",
    "3X-LARGE",
    "4X-LARGE",
    "5X-LARGE",
    "6X-LARGE",
)

# Session token validity (seconds); master token lasts 4x
# (reference: pkg/session/manager.go:48-108, 205-267).
SESSION_TOKEN_VALIDITY_SECS = 3600
MASTER_TOKEN_VALIDITY_FACTOR = 4
