"""Build the reference minicrawler binary from /root/reference for
differential testing (tests/test_reference_diff.py).

The sandbox lacks c-ares and autotools, so this compiles the sources
directly with a minimal synchronous c-ares shim (getaddrinfo-backed;
the callback fires inside ares_gethostbyname, which the reference's
state machine tolerates — it only advances url->state). HTTP/2 is
disabled (no libnghttp2 headers); SSL is enabled (loopback tests use
plain http anyway).

Usage: python tools_build_reference.py [outdir]  -> prints binary path
Idempotent: skips the build when the binary already exists.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REF = "/root/reference"
DEFAULT_OUT = "/tmp/mcbin"

CONFIG_H = """\
#define VERSION "5.2.7"
#define HAVE_LIBSSL 1
#define HAVE_LIBCRYPTO 1
#define HAVE_LIBICUUC 1
#define HAVE_TIMEGM 1
#define HAVE_SSL_CTX_SET_ALPN_PROTOS 1
#define HAVE_DECL_SSL_GET_MAX_PROTO_VERSION 1
#define HAVE_SYS_TYPES_H 1
#define HAVE_SYS_SELECT_H 1
#define HAVE_LIMITS_H 1
#define HAVE_MEMPCPY 1
#define HAVE_STRCHRNUL 1
#define HAVE_CLOCK_GETTIME 1
"""

ARES_H = """\
#ifndef ARES_SHIM_H
#define ARES_SHIM_H
#include <netdb.h>
#include <sys/select.h>
#include <sys/time.h>
#define ARES_SUCCESS 0
#define ARES_ENODATA 1
#define ARES_ENOTFOUND 4
#define ARES_EDESTRUCTION 50
#define ARES_OPT_TIMEOUTMS (1 << 0)
typedef struct ares_channeldata *ares_channel;
struct ares_options { int timeout; };
typedef void (*ares_host_callback)(void *arg, int status, int timeouts,
                                   struct hostent *hostent);
int ares_init_options(ares_channel *ch, struct ares_options *o, int m);
void ares_gethostbyname(ares_channel ch, const char *name, int family,
                        ares_host_callback cb, void *arg);
int ares_fds(ares_channel ch, fd_set *r, fd_set *w);
struct timeval *ares_timeout(ares_channel ch, struct timeval *max,
                             struct timeval *tv);
void ares_process(ares_channel ch, fd_set *r, fd_set *w);
void ares_destroy(ares_channel ch);
const char *ares_strerror(int code);
#endif
"""

ARES_C = """\
/* Synchronous c-ares stand-in: resolves via getaddrinfo and fires the
 * callback inside ares_gethostbyname. */
#include "ares.h"
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>

struct ares_channeldata { int dummy; };

int ares_init_options(ares_channel *ch, struct ares_options *o, int m) {
    (void)o; (void)m;
    *ch = malloc(sizeof(struct ares_channeldata));
    return ARES_SUCCESS;
}

void ares_gethostbyname(ares_channel ch, const char *name, int family,
                        ares_host_callback cb, void *arg) {
    (void)ch;
    struct addrinfo hints, *res = NULL, *p;
    memset(&hints, 0, sizeof(hints));
    hints.ai_family = family;
    hints.ai_socktype = SOCK_STREAM;
    if (getaddrinfo(name, NULL, &hints, &res) != 0 || res == NULL) {
        cb(arg, ARES_ENOTFOUND, 0, NULL);
        return;
    }
    int n = 0;
    for (p = res; p; p = p->ai_next) n++;
    char **addrs = calloc(n + 1, sizeof(char *));
    int len = family == AF_INET6 ? 16 : 4, i = 0;
    for (p = res; p; p = p->ai_next) {
        if (p->ai_family != family) continue;
        addrs[i] = malloc(len);
        if (family == AF_INET6)
            memcpy(addrs[i],
                   &((struct sockaddr_in6 *)p->ai_addr)->sin6_addr, 16);
        else
            memcpy(addrs[i],
                   &((struct sockaddr_in *)p->ai_addr)->sin_addr, 4);
        i++;
    }
    struct hostent he;
    memset(&he, 0, sizeof(he));
    he.h_name = (char *)name;
    he.h_addrtype = family;
    he.h_length = len;
    he.h_addr_list = addrs;
    cb(arg, i > 0 ? ARES_SUCCESS : ARES_ENODATA, 0, &he);
    for (int j = 0; j < i; j++) free(addrs[j]);
    free(addrs);
    freeaddrinfo(res);
}

int ares_fds(ares_channel ch, fd_set *r, fd_set *w) {
    (void)ch; (void)r; (void)w; return 0;
}
struct timeval *ares_timeout(ares_channel ch, struct timeval *max,
                             struct timeval *tv) {
    (void)ch; (void)max; return tv;
}
void ares_process(ares_channel ch, fd_set *r, fd_set *w) {
    (void)ch; (void)r; (void)w;
}
void ares_destroy(ares_channel ch) { free(ch); }
const char *ares_strerror(int code) {
    switch (code) {
    case ARES_ENODATA: return "No data";
    case ARES_ENOTFOUND: return "Not found";
    default: return "ares error";
    }
}
"""

SOURCES = [
    "src/crawler.c", "src/cert.c", "src/conv.c", "src/converthtml2text.c",
    "src/entities.c", "src/inflate.c", "src/time.c", "src/malloc.c",
    "src/base64.c", "src/digcalc.c", "src/cookies.c", "src/tpl/tpl.c",
    "src/serialize.c", "src/memory.c", "src/auth.c", "src/http1.c",
    "src/http2.c", "src/debug.c", "src/buf.c", "src/api.c",
    "src/url/serialize.c", "src/url/api.c", "src/url/alloc.c",
    "src/main.c", "src/cli.c", "ares_shim.c",
]


def build(outdir: str = DEFAULT_OUT) -> str:
    binary = os.path.join(outdir, "minicrawler5")
    if os.path.exists(binary):
        return binary
    os.makedirs(outdir, exist_ok=True)
    shutil.copytree(os.path.join(REF, "src"), os.path.join(outdir, "src"),
                    dirs_exist_ok=True)
    with open(os.path.join(outdir, "src/h/config.h"), "w") as f:
        f.write(CONFIG_H)
    with open(os.path.join(outdir, "ares.h"), "w") as f:
        f.write(ARES_H)
    with open(os.path.join(outdir, "ares_shim.c"), "w") as f:
        f.write(ARES_C)
    # glibc string.h conflict in the url lib (the reference's private
    # h/string.h shadows the system header under -I flattening)
    api_c = os.path.join(outdir, "src/url/api.c")
    with open(api_c) as f:
        src = f.read()
    with open(api_c, "w") as f:
        f.write(src.replace('#include "../h/string.h"', "/* shim */"))

    cflags = ["-O1", "-I.", "-Isrc", "-DBUILDING_MCRAWLER", "-D_GNU_SOURCE",
              "-w"]
    objs = []
    for i, src_file in enumerate(SOURCES):
        obj = "obj%d.o" % i
        subprocess.run(
            ["gcc"] + cflags + ["-c", src_file, "-o", obj],
            cwd=outdir, check=True, capture_output=True,
        )
        objs.append(obj)
    subprocess.run(
        ["g++", "-std=c++14"] + cflags + ["-c", "src/url/parse.cc",
                                          "-o", "obj_parse.o"],
        cwd=outdir, check=True, capture_output=True,
    )
    objs.append("obj_parse.o")
    subprocess.run(
        ["g++"] + objs + ["-lssl", "-lcrypto", "-lz", "-licuuc", "-lm",
                          "-o", "minicrawler5"],
        cwd=outdir, check=True, capture_output=True,
    )
    return binary


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT))
