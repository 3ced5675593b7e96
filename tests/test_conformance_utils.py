"""CaseInsensitiveDict / FilePart conformance (reference test_utils.py)."""

import io

from warc_ray.core import CaseInsensitiveDict, FilePart


class TestCaseInsensitiveDict:
    # test_utils.py:4-18
    def test_all(self):
        d = CaseInsensitiveDict()
        d["Foo"] = 1
        assert d["foo"] == 1
        assert "foo" in d
        assert "Foo" in d

        assert "bar" not in d
        d["BAR"] = 2
        assert "bar" in d
        assert d["bar"] == 2

        assert sorted(d.keys()) == ["bar", "foo"]
        assert sorted(d.items()) == [("bar", 2), ("foo", 1)]

    def test_insertion_order(self):
        # py3 determinism improvement over the reference's py2 hash order
        d = CaseInsensitiveDict()
        d["B"] = 1
        d["a"] = 2
        d["C"] = 3
        assert list(d.keys()) == ["b", "a", "c"]


class TestFilePart:
    # 5 chars in each line
    text = b"\n".join([b"aaaa", b"bbbb", b"cccc", b"dddd", b"eeee", b"ffff"])

    # test_utils.py:25-37
    def test_read(self):
        part = FilePart(io.BytesIO(self.text), 0)
        assert part.read() == b""

        part = FilePart(io.BytesIO(self.text), 5)
        assert part.read() == b"aaaa\n"

        part = FilePart(io.BytesIO(self.text), 10)
        assert part.read() == b"aaaa\nbbbb\n"

        part = FilePart(io.BytesIO(b"a" * 10000), 10)
        assert len(part.read()) == 10

    # test_utils.py:39-45
    def test_read_with_size(self):
        part = FilePart(io.BytesIO(self.text), 10)
        assert part.read(3) == b"aaa"
        assert part.read(3) == b"a\nb"
        assert part.read(3) == b"bbb"
        assert part.read(3) == b"\n"
        assert part.read(3) == b""

    # test_utils.py:47-52
    def test_readline(self):
        part = FilePart(io.BytesIO(self.text), 11)
        assert part.readline() == b"aaaa\n"
        assert part.readline() == b"bbbb\n"
        assert part.readline() == b"c"
        assert part.readline() == b""

    # test_utils.py:54-56
    def test_iter(self):
        part = FilePart(io.BytesIO(self.text), 11)
        assert list(part) == [b"aaaa\n", b"bbbb\n", b"c"]
