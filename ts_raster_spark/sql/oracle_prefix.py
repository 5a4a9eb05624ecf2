"""DuckDB-dialect CTE prefixes mirroring the engine's deterministic
derivations, so every oracle query runs over byte-identical inputs.

``TURNS_CTE`` must stay in lockstep with
:func:`ts_raster_spark.sources.turns.derive_turns_from_events` and
``LONG_CTE`` with :func:`ts_raster_spark.operators.longform.to_long_panel`.
"""

# One conversation per user_id; stable order (ts, event_id).
TURNS_CTE = """
WITH turns_base AS (
    SELECT
        printf('conv-%06d', user_id) AS conv_id,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
        CASE event_type
            WHEN 'click' THEN 'user'
            WHEN 'view' THEN 'assistant'
            WHEN 'purchase' THEN 'tool'
            WHEN 'signup' THEN 'system'
            ELSE 'assistant'
        END AS role,
        props AS _props,
        CASE WHEN event_type = 'purchase' THEN
            CASE event_id % 4
                WHEN 0 THEN 'search' WHEN 1 THEN 'code'
                WHEN 2 THEN 'browser' ELSE 'calc'
            END
        END AS tool,
        ts,
        value
    FROM events
),
turns AS (
    SELECT
        conv_id, turn_idx, role,
        -- mirror Spark concat_ws: NULL parts are SKIPPED, not propagated
        CASE WHEN _props IS NULL
             THEN conv_id || ':' || CAST(turn_idx AS VARCHAR)
             ELSE conv_id || ':' || CAST(turn_idx AS VARCHAR) || ':' || _props
        END AS text,
        tool, ts, value
    FROM turns_base
)
"""

# Long tidy panel: one row per (conv_id, turn_idx, ts, kind, value) —
# DuckDB mirror of operators/longform.py (kinds derived per turn, then
# UNION ALL unpivot; latency uses epoch() for µs-exact double seconds).
LONG_CTE = TURNS_CTE + """,
channels AS (
    SELECT
        conv_id, turn_idx, ts,
        CAST(length(text) AS DOUBLE) AS text_len,
        epoch(ts) - epoch(lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts)) AS latency_s,
        CAST(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END AS DOUBLE) AS is_tool,
        CAST(CASE WHEN role = 'user' THEN 1 ELSE 0 END AS DOUBLE) AS role_user,
        CAST(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS DOUBLE) AS role_assistant,
        value AS value_chan
    FROM turns
),
long_panel AS (
    -- every branch null-filters: to_long_panel drops ALL null channel
    -- values, not just latency (longform.py isNotNull filter)
    SELECT conv_id, turn_idx, ts, 'text_len' AS kind, text_len AS value FROM channels WHERE text_len IS NOT NULL
    UNION ALL
    SELECT conv_id, turn_idx, ts, 'latency_s', latency_s FROM channels WHERE latency_s IS NOT NULL
    UNION ALL
    SELECT conv_id, turn_idx, ts, 'is_tool', is_tool FROM channels WHERE is_tool IS NOT NULL
    UNION ALL
    SELECT conv_id, turn_idx, ts, 'role_user', role_user FROM channels WHERE role_user IS NOT NULL
    UNION ALL
    SELECT conv_id, turn_idx, ts, 'role_assistant', role_assistant FROM channels WHERE role_assistant IS NOT NULL
    UNION ALL
    SELECT conv_id, turn_idx, ts, 'value', value_chan FROM channels WHERE value_chan IS NOT NULL
)
"""
