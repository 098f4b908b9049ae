"""Import every plan module so its queries register (plans.registry).

``__spark_entry__.py`` imports this single module; adding a new plan
file means adding one import line here.
"""

from web_attack_detection_spark.plans import features, relational  # noqa: F401

try:
    from web_attack_detection_spark.plans import relational2  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:
    from web_attack_detection_spark.plans import relational3  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:
    from web_attack_detection_spark.plans import relational4  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:
    from web_attack_detection_spark.plans import relational5  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:
    from web_attack_detection_spark.plans import relational6  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:
    from web_attack_detection_spark.plans import relational7  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:
    from web_attack_detection_spark.plans import relational8  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:
    from web_attack_detection_spark.plans import relational9  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:  # modules added in later phases — keep entry importable mid-build
    from web_attack_detection_spark.plans import dedup  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import text  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import text2  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import relational10  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import text3  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import similarity  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import similarity2  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import similarity3  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import pipelineq  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import mlq  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import multimodal  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import streamq  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import refshape  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import text4  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from web_attack_detection_spark.plans import graphq  # noqa: F401
except ImportError:  # pragma: no cover
    pass
