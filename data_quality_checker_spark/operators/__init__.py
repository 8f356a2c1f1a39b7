"""DQ / stats / temporal / dedup / similarity operators.

Each operator is a pure function ``DataFrame -> DataFrame`` (never
mutates input, unlike the reference which writes back into ``self.data``
— see SURVEY.md §1.1). Heavy lifting stays declarative so Catalyst fuses
multiple checks into single scans.
"""
