"""Sample <-> colour metadata.

Behavior parity with ``bigsi/graph/metadata.py``:

* colours are assigned densely by a monotonically increasing counter;
* deleting a sample renames its colour to the ``D3L3T3D`` sentinel and
  sets the sample's colour to ``-1`` — the counter is NOT decremented;
* duplicate sample names are rejected with ``ValueError``;
* merging appends the other index's samples, suffixing clashes with
  ``_duplicate_in_merge`` (``metadata.py:74-80``).

Keys use the reference's ``metadata:`` prefix and typed suffixes so a
serialized store is recognizable, but the backing store is a single
typed KV (see :mod:`bigsi_tpu.storage`), not three database engines.
"""

from __future__ import annotations

DELETION_SPECIAL_SAMPLE_NAME = "D3L3T3D"


class SampleMetadata:
    def __init__(self, storage):
        # Named to avoid clashing with KmerSignatureIndex.storage when
        # both are mixed into BIGSI (the reference shares one handle;
        # here metadata uses the KV while the index uses the full store).
        self.metadata_kv = storage

    @property
    def colour_count_key(self):
        return "colour_count"

    @property
    def num_samples(self) -> int:
        try:
            return self._get_integer(self.colour_count_key)
        except KeyError:
            return 0

    def add_sample(self, sample_name: str) -> int:
        self._validate_sample_name(sample_name)
        colour = self.num_samples
        self._set_sample_colour(sample_name, colour)
        self._set_colour_sample(colour, sample_name)
        return self._increment_colour_count()

    def add_samples(self, sample_names) -> None:
        for sample_name in sample_names:
            self.add_sample(sample_name)

    def delete_sample(self, sample_name: str) -> None:
        colour = self.sample_to_colour(sample_name)
        self._set_colour_sample(colour, DELETION_SPECIAL_SAMPLE_NAME)
        self._set_sample_colour(sample_name, -1)

    def sample_name_exists(self, sample_name: str) -> bool:
        try:
            self._get_integer(sample_name)
            return True
        except KeyError:
            return False

    def sample_to_colour(self, sample_name: str):
        try:
            colour = self._get_integer(sample_name)
            return None if colour < 0 else colour
        except KeyError:
            return None

    def colour_to_sample(self, colour: int) -> str:
        return self._get_string(colour)

    def samples_to_colours(self, sample_names):
        return {
            s: self.sample_to_colour(s)
            for s in sample_names
            if self.sample_to_colour(s) is not None
        }

    def colours_to_samples(self, colours):
        return {c: self.colour_to_sample(c) for c in colours if self.colour_to_sample(c)}

    def sample_names(self):
        """All colour -> name pairs in colour order (deleted included)."""
        return [self.colour_to_sample(c) for c in range(self.num_samples)]

    def merge_metadata(self, sm: "SampleMetadata") -> None:
        for c in range(sm.num_samples):
            sample = sm.colour_to_sample(c)
            try:
                self.add_sample(sample)
            except ValueError:
                self.add_sample(sample + "_duplicate_in_merge")

    # -- typed KV plumbing (reference key scheme) ---------------------

    def _add_key_prefix(self, key):
        return ":".join(["metadata", str(key)])

    def _set_integer(self, key, value):
        self.metadata_kv.set_integer(self._add_key_prefix(key), value)

    def _get_integer(self, key):
        return self.metadata_kv.get_integer(self._add_key_prefix(key))

    def _set_string(self, key, value):
        self.metadata_kv.set_string(self._add_key_prefix(key), value)

    def _get_string(self, key):
        return self.metadata_kv.get_string(self._add_key_prefix(key))

    def _set_sample_colour(self, sample_name, colour):
        self._set_integer(sample_name, colour)

    def _set_colour_sample(self, colour, sample_name):
        self._set_string(colour, sample_name)

    def _increment_colour_count(self):
        return self.metadata_kv.incr(self._add_key_prefix(self.colour_count_key))

    def _validate_sample_name(self, sample_name):
        if sample_name == DELETION_SPECIAL_SAMPLE_NAME:
            raise ValueError(
                "You can't call a sample %s" % DELETION_SPECIAL_SAMPLE_NAME
            )
        if self.sample_name_exists(sample_name):
            raise ValueError("You can't insert two samples with the same name")
