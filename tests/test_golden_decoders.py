"""Golden decoder fixtures from an EXTERNAL encoder (ADVICE r4).

The PNG/JPEG suites in test_media_decoders/test_jpeg round-trip against
encoders written alongside the decoders, so a symmetric bug (transposed
zigzag, swapped Cb/Cr in both directions) would pass. These fixtures were
produced by Java ImageIO (javax.imageio, JDK 17 — an independent
implementation lineage) from deterministic pixel formulas; the JPEG
expected values are ImageIO's OWN raster decode of its output, so the
assertions pin our decoders to an external codec end to end.

PNG is lossless: the decode must match the source formula byte-exactly.
JPEG is lossy: smooth-content fixtures must match within IDCT rounding
(+-4); the sharp-edge color fixture within the chroma-upsampling
interpolation envelope (ImageIO decodes 4:2:0 chroma with a triangular
filter, we use replication — measured max delta 21 at chroma wrap edges,
max 3 on smooth content, while a channel-order or zigzag bug measures
50-150+ everywhere).
"""

import base64

import numpy as np

from entitylinking_spark.functions.jpeg import decode_jpeg
from entitylinking_spark.operators.multimodal import decode_png

W, H = 13, 7

GOLDEN_PNG_B64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAA0AAAAHCAIAAABcElBNAAABCUlEQVR4XgXByyqwQRgA4HdnoSxM"
    "lKKIGUKEHEbOZ+8/zmdhCBHy1oii/qJMKQubSXMPcwWzmXuYG5jVdyGeBwCAQY2AOgkNCpo1tBvo"
    "tjDgYSzAdIKlDGsV7ALwWsbrBW+SvFXxTs37DB+2fMLz+cAx8a3MDyuuAbCRYYvADok9Cgc1SoMz"
    "Fpc9rgfcS3iS8bLCOwBqY9QlqF/SiKJJTQuG/lna9nQU6DzRTabHip4BXC9zQ8KNSzer3Ip2G8bt"
    "W3fq3VVw98mZ7F4r9w4QR1mcEnFRRqXijo7HJl7YeOsjhfiS4v8cP6v4DVDmWFkVZVOWA1XOdLk2"
    "5cGWJ1/eQvlI5SuXn6r8/gE1K2ql2oBc4AAAAABJRU5ErkJggg=="
)

GOLDEN_COLOR_JPG_B64 = (
    "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0a"
    "HBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIy"
    "MjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAHAA0DASIA"
    "AhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQA"
    "AAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3"
    "ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWm"
    "p6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEA"
    "AwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSEx"
    "BhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElK"
    "U1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3"
    "uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDD0v4f"
    "R/L8qfpXX2fw+j8n7qfpRRXirFVe5x8P5xi+T4j/2Q=="
)

# ImageIO raster decode of GOLDEN_COLOR_JPG (r,g,b per pixel, row-major)
COLOR_JPG_EXPECT = (
    "0;3;0;4;5;0;19;9;8;36;9;14;54;8;21;75;7;28;100;7;36;120;6;42;138;5;50;156;4;"
    "55;174;6;65;189;9;72;201;10;77;12;35;17;22;39;23;39;42;31;54;43;37;73;41;44;"
    "94;41;51;118;41;59;138;40;65;157;39;73;174;38;78;193;40;87;207;43;94;219;44;"
    "99;10;62;23;19;67;29;35;70;37;52;72;44;71;70;49;91;69;55;114;69;64;134;68;70"
    ";155;67;79;172;67;84;190;68;91;206;72;99;218;73;106;13;102;36;24;106;42;40;1"
    "10;50;56;111;56;75;108;61;94;109;68;118;109;78;138;108;84;158;106;92;175;105"
    ";97;195;107;105;209;111;112;221;112;118;13;141;46;22;146;52;39;149;60;55;150"
    ";66;75;149;72;95;148;78;118;148;88;138;147;94;159;146;102;174;144;106;193;14"
    "7;114;209;149;121;221;150;128;14;176;57;25;180;62;41;183;71;57;184;77;77;183"
    ";83;97;182;89;119;183;97;139;181;105;160;181;112;177;178;118;196;181;126;211"
    ";183;133;222;186;138;24;210;73;33;215;78;49;219;87;66;221;94;85;218;99;105;2"
    "17;105;129;217;113;150;217;122;170;216;128;186;215;135;204;216;142;220;220;1"
    "50;232;221;155"
)

GOLDEN_GRAY_JPG_B64 = (
    "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0a"
    "HBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAHAA0BAREA/8QAHwAAAQUBAQEB"
    "AQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1Fh"
    "ByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZ"
    "WmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXG"
    "x8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/AFtvDeh+C9GTVNZfy4C/"
    "lxrHGXaSTazBBjgEhTySB6kVTufF3iLUZXPh4waVp6OREDDHJLIvGDIXDAHgnCgY3YJbANf/2Q=="
)

GRAY_JPG_EXPECT = (
    "4;5;34;59;70;73;111;120;142;148;166;191;195;23;56;61;63;108;122;124;142;161;"
    "184;209;188;254;60;72;94;111;131;140;156;194;196;212;218;255;0;92;88;121;140"
    ";148;166;191;197;225;244;4;14;29;118;139;148;149;194;200;229;230;249;0;39;62"
    ";64;137;143;202;203;214;233;241;10;44;40;59;73;85;180;203;199;214;230;1;14;4"
    "6;35;79;93;98;138"
)

GOLDEN_SMOOTH_JPG_B64 = (
    "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0a"
    "HBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIy"
    "MjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAQABADASIA"
    "AhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQA"
    "AAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3"
    "ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWm"
    "p6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEA"
    "AwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSEx"
    "BhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElK"
    "U1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3"
    "uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDmRHTx"
    "HU4jqQR1yJn6NGof/9k="
)

SMOOTH_JPG_EXPECT = (
    "200;31;64;200;31;64;200;31;64;201;32;65;202;31;65;202;31;65;205;31;68;205;31"
    ";68;209;30;69;209;30;69;210;29;70;211;30;71;212;29;73;212;29;73;213;30;74;21"
    "3;30;74;200;31;64;201;32;65;201;32;65;201;32;65;203;32;66;203;32;66;205;31;6"
    "8;206;32;69;207;31;69;210;31;70;211;30;71;211;30;71;213;30;74;213;30;74;213;"
    "30;74;214;31;75;201;34;64;201;34;64;201;33;66;201;33;66;203;34;67;203;34;67;"
    "205;34;70;207;33;70;209;33;71;209;33;71;211;32;72;211;32;72;213;32;73;213;32"
    ";73;214;33;74;214;33;74;202;35;65;202;35;65;203;35;68;203;35;68;204;35;68;20"
    "5;36;69;206;35;71;206;35;71;209;35;72;210;34;72;211;35;74;213;34;74;213;34;7"
    "4;214;35;75;215;34;75;214;35;75;202;37;67;202;37;67;202;37;67;203;38;68;205;"
    "37;70;205;37;70;207;38;71;208;37;71;209;38;74;211;37;74;211;37;74;213;37;75;"
    "213;37;76;213;37;76;216;37;77;214;38;77;202;39;68;202;39;68;203;40;69;203;40"
    ";69;205;40;72;205;40;72;207;39;72;208;39;72;209;39;75;210;39;75;211;40;76;21"
    "3;39;76;214;39;78;214;39;78;215;39;78;214;39;78;201;41;67;202;42;68;202;42;7"
    "0;202;42;70;205;42;71;205;42;71;206;41;73;207;42;74;209;41;74;211;42;75;211;"
    "41;77;212;41;77;213;42;78;213;42;78;215;41;78;214;43;79;200;44;68;200;44;68;"
    "201;44;71;202;43;71;202;43;71;204;44;72;204;43;74;206;43;74;208;43;75;208;43"
    ";75;211;43;78;211;43;78;212;42;78;213;43;79;213;43;79;213;43;79;200;46;70;20"
    "0;46;70;200;46;70;203;47;71;203;47;71;204;46;71;205;46;74;206;46;74;208;47;7"
    "8;210;47;78;211;46;78;212;47;79;214;46;81;214;46;81;215;47;82;215;47;82;199;"
    "47;70;200;48;71;200;48;71;201;47;71;202;48;72;204;48;72;204;47;74;206;47;75;"
    "207;48;78;209;48;79;209;48;79;211;48;79;212;48;82;213;48;82;213;48;82;214;49"
    ";83;199;50;70;199;50;70;199;50;70;201;49;70;202;50;73;202;50;73;204;50;74;20"
    "6;50;74;208;51;78;209;50;78;209;50;80;210;49;80;211;50;81;213;50;81;214;51;8"
    "2;214;51;82;199;52;71;199;52;71;200;53;72;201;52;72;201;52;74;202;53;75;204;"
    "52;75;205;51;75;207;53;79;209;52;79;210;53;82;211;52;82;211;52;82;213;52;83;"
    "213;52;83;213;52;83;200;54;73;200;54;73;200;54;73;202;55;74;202;55;74;203;54"
    ";74;204;55;77;206;54;77;208;56;81;209;55;81;209;55;81;212;55;82;212;55;84;21"
    "3;54;84;214;55;85;214;55;85;199;56;74;199;56;74;202;56;75;202;56;75;204;57;7"
    "6;204;57;76;205;56;78;205;56;78;209;57;82;209;57;82;211;57;83;211;57;83;214;"
    "57;86;214;57;86;215;56;86;215;56;86;199;58;75;200;59;76;201;58;76;201;58;76;"
    "204;58;77;204;58;77;205;57;79;206;58;80;208;59;81;209;60;82;211;59;84;211;59"
    ";84;213;59;85;213;59;85;215;58;87;216;59;88;200;59;76;200;59;76;202;59;77;20"
    "2;59;77;204;58;77;205;59;78;206;58;80;206;58;80;209;60;82;209;60;82;212;60;8"
    "5;212;60;85;213;59;85;214;60;86;216;59;88;216;59;88"
)



def _vals(s, shape):
    return np.array([int(v) for v in s.split(";")], dtype=np.int32).reshape(shape)


def test_png_golden_exact():
    """Source formula: r=(x*19)%256, g=(y*37)%256, b=(x*7+y*11)%256."""
    expect = np.zeros((H, W, 3), dtype=np.uint8)
    for y in range(H):
        for x in range(W):
            expect[y, x] = [(x * 19) % 256, (y * 37) % 256, (x * 7 + y * 11) % 256]
    got = decode_png(base64.b64decode(GOLDEN_PNG_B64))
    assert got.shape == (H, W, 3)
    assert np.array_equal(got, expect)


def test_jpeg_gray_golden():
    got = decode_jpeg(base64.b64decode(GOLDEN_GRAY_JPG_B64)).astype(np.int32)
    if got.ndim == 3:
        got = got[:, :, 0]
    ref = _vals(GRAY_JPG_EXPECT, (H, W))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= 2


def test_jpeg_smooth_color_golden():
    got = decode_jpeg(base64.b64decode(GOLDEN_SMOOTH_JPG_B64)).astype(np.int32)
    ref = _vals(SMOOTH_JPG_EXPECT, (16, 16, 3))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() <= 4


def test_jpeg_sharp_color_golden():
    """Sharp chroma edges (mod-256 wraps): bounded by the upsampling
    interpolation envelope, far below any channel-order/zigzag failure."""
    got = decode_jpeg(base64.b64decode(GOLDEN_COLOR_JPG_B64)).astype(np.int32)
    ref = _vals(COLOR_JPG_EXPECT, (H, W, 3))
    assert got.shape == ref.shape
    d = np.abs(got - ref)
    assert d.max() <= 24 and d.mean() <= 8.0


def test_jpeg_ff_fill_padding():
    """T.81 B.1.1.2 fill bytes before a marker must be skipped (ADVICE r4):
    inserting 0xFF padding between segments of a golden stream must not
    change the decode."""
    raw = base64.b64decode(GOLDEN_GRAY_JPG_B64)
    # insert two fill bytes before the first post-SOI marker (raw[2]==0xFF)
    assert raw[2] == 0xFF
    padded = raw[:2] + b"\xff\xff" + raw[2:]
    a = decode_jpeg(raw)
    b = decode_jpeg(padded)
    assert np.array_equal(a, b)
