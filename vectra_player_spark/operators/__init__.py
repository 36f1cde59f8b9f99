"""DataFrame-level operators (each a pure function DataFrame -> DataFrame).

These are the engine's reusable building blocks; the plan modules in
``vectra_player_spark.plans`` compose them into the declared query surface.
"""
