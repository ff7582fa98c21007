from .rules import (  # noqa: F401
    Rule,
    SPORT_DISTANCE_RANGES,
    duplicate_ids,
    referential_orphans,
    run_rules,
    standard_activity_rules,
)
