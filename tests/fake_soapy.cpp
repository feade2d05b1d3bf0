// Fake libSoapySDR implementing exactly the C-API surface rx_tools_tpu's
// ctypes binding uses (rx_tools_tpu/iq/soapy.py), so the hardware path is
// testable without a radio — the same trick tests/test_rtltcp.py plays
// with a mock rtl_tcp server.  Mirrors the call shapes of
// /root/reference/src/convenience/convenience.c:138-513 and the stream
// loop of /root/reference/src/rtl_sdr.c:318-346.
//
// Build (new ABI):  g++ -shared -fPIC -o libfakesoapy.so fake_soapy.cpp
// Build (old ABI):  g++ -shared -fPIC -DOLD_ABI -o libfakesoapy_old.so ...
//
// Behavior knobs via the make query string:
//   driver=rtlsdr|hackrf|...   -> getDriverKey "RTLSDR"/"HackRF"/"FakeSDR"
//   fail=make                  -> makeStrArgs returns NULL
//   reject=<setting-key>       -> writeSetting/readSetting fail for key
//   native=<FMT>               -> setupStream also accepts FMT (CS12/CU8/
//                                 CS8/CF32) and readStream then serves the
//                                 deterministic ramp in that wire format
//                                 (the rx_sdr -I hardware path,
//                                 rtl_sdr.c:301,348-391)
// and via writeSetting:
//   fake_overflow=<n>          -> the next n readStream calls return -4
//   fake_gain_mode readback    -> setGainMode records "auto"/"manual"

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

extern "C" {

struct SoapySDRKwargs {
    size_t size;
    char **keys;
    char **vals;
};

struct FakeDevice {
    std::string query;
    std::string driver;
    std::map<std::string, std::string> settings;
    std::string reject;
    double sample_rate = 2048000.0;
    double frequency = 100e6;
    double bandwidth = 0.0;
    double correction = 0.0;
    double gain = 0.0;
    std::map<std::string, double> gain_elements;
    std::string antenna;
    int overflow_budget = 0;
    long long sample_counter = 0;
    int activated = 0;
};

struct FakeStream {
    FakeDevice *dev;
    std::string format;
};

static char g_last_error[256] = "";

static void set_error(const char *msg) {
    snprintf(g_last_error, sizeof(g_last_error), "%s", msg);
}

static std::string query_val(const std::string &q, const std::string &key) {
    size_t pos = 0;
    while (pos < q.size()) {
        size_t end = q.find(',', pos);
        if (end == std::string::npos) end = q.size();
        std::string pair = q.substr(pos, end - pos);
        size_t eq = pair.find('=');
        if (eq != std::string::npos && pair.substr(0, eq) == key)
            return pair.substr(eq + 1);
        pos = end + 1;
    }
    return "";
}

const char *SoapySDR_getAPIVersion(void) {
#ifdef OLD_ABI
    return "0.7.2";
#else
    return "0.8.1";
#endif
}

const char *SoapySDR_errToStr(const int errorCode) {
    switch (errorCode) {
        case -1: return "TIMEOUT";
        case -2: return "STREAM_ERROR";
        case -3: return "CORRUPTION";
        case -4: return "OVERFLOW";
        case -5: return "NOT_SUPPORTED";
        case -6: return "TIME_ERROR";
        case -7: return "UNDERFLOW";
        default: return "UNKNOWN";
    }
}

const char *SoapySDRDevice_lastError(void) { return g_last_error; }

void *SoapySDRDevice_makeStrArgs(const char *args) {
    std::string q = args ? args : "";
    if (query_val(q, "fail") == "make") {
        set_error("fake: make failure injected");
        return nullptr;
    }
    FakeDevice *d = new FakeDevice();
    d->query = q;
    std::string drv = query_val(q, "driver");
    if (drv == "rtlsdr") d->driver = "RTLSDR";
    else if (drv == "hackrf") d->driver = "HackRF";
    else d->driver = "FakeSDR";
    d->reject = query_val(q, "reject");
    return d;
}

void SoapySDRDevice_unmake(void *dev) { delete (FakeDevice *)dev; }

char *SoapySDRDevice_getDriverKey(const void *dev) {
    return strdup(((const FakeDevice *)dev)->driver.c_str());
}

char *SoapySDRDevice_getHardwareKey(const void *dev) {
    return strdup("FAKE0001");
}

SoapySDRKwargs SoapySDRDevice_getHardwareInfo(const void *dev) {
    SoapySDRKwargs kw;
    kw.size = 2;
    kw.keys = (char **)malloc(2 * sizeof(char *));
    kw.vals = (char **)malloc(2 * sizeof(char *));
    kw.keys[0] = strdup("origin");
    kw.vals[0] = strdup("fake_soapy.cpp");
    kw.keys[1] = strdup("serial");
    kw.vals[1] = strdup("00000001");
    return kw;
}

size_t SoapySDRDevice_getNumChannels(const void *dev, const int direction) {
    return 2;
}

static char **str_list(const std::vector<const char *> &v, size_t *length) {
    *length = v.size();
    char **out = (char **)malloc(v.size() * sizeof(char *));
    for (size_t i = 0; i < v.size(); ++i) out[i] = strdup(v[i]);
    return out;
}

char **SoapySDRDevice_listAntennas(const void *dev, const int dir,
                                   const size_t chan, size_t *length) {
    return str_list({"RX", "TX"}, length);
}

char **SoapySDRDevice_listGains(const void *dev, const int dir,
                                const size_t chan, size_t *length) {
    const FakeDevice *d = (const FakeDevice *)dev;
    if (d->driver == "HackRF") return str_list({"LNA", "VGA", "AMP"}, length);
    return str_list({"TUNER"}, length);
}

char **SoapySDRDevice_listFrequencies(const void *dev, const int dir,
                                      const size_t chan, size_t *length) {
    return str_list({"RF", "CORR"}, length);
}

static double *dbl_list(const std::vector<double> &v, size_t *length) {
    *length = v.size();
    double *out = (double *)malloc(v.size() * sizeof(double));
    for (size_t i = 0; i < v.size(); ++i) out[i] = v[i];
    return out;
}

double *SoapySDRDevice_listSampleRates(const void *dev, const int dir,
                                       const size_t chan, size_t *length) {
    return dbl_list({250000, 1024000, 2048000, 2400000, 3200000}, length);
}

double *SoapySDRDevice_listBandwidths(const void *dev, const int dir,
                                      const size_t chan, size_t *length) {
    return dbl_list({300000, 1536000, 8000000}, length);
}

int SoapySDRDevice_setSampleRate(void *dev, const int dir, const size_t chan,
                                 const double rate) {
    ((FakeDevice *)dev)->sample_rate = rate;
    return 0;
}

int SoapySDRDevice_setFrequency(void *dev, const int dir, const size_t chan,
                                const double freq, const void *args) {
    ((FakeDevice *)dev)->frequency = freq;
    return 0;
}

double SoapySDRDevice_getFrequency(const void *dev, const int dir,
                                   const size_t chan) {
    return ((const FakeDevice *)dev)->frequency;
}

int SoapySDRDevice_setBandwidth(void *dev, const int dir, const size_t chan,
                                const double bw) {
    ((FakeDevice *)dev)->bandwidth = bw;
    return 0;
}

int SoapySDRDevice_setGain(void *dev, const int dir, const size_t chan,
                           const double value) {
    ((FakeDevice *)dev)->gain = value;
    return 0;
}

int SoapySDRDevice_setGainElement(void *dev, const int dir, const size_t chan,
                                  const char *name, const double value) {
    FakeDevice *d = (FakeDevice *)dev;
    size_t n_gains = 0;
    char **gains = SoapySDRDevice_listGains(dev, dir, chan, &n_gains);
    bool known = false;
    for (size_t i = 0; i < n_gains; ++i) {
        if (strcmp(gains[i], name) == 0) known = true;
        free(gains[i]);
    }
    free(gains);
    if (!known) {
        set_error("fake: unknown gain element");
        return -5;
    }
    d->gain_elements[name] = value;
    return 0;
}

int SoapySDRDevice_setGainMode(void *dev, const int dir, const size_t chan,
                               const bool automatic) {
    // recorded so tests can assert -E rtlagc/agc reached the device
    // (the reference's mechanism, rtl_fm.c:1432)
    ((FakeDevice *)dev)->settings["fake_gain_mode"] =
        automatic ? "auto" : "manual";
    return 0;
}

int SoapySDRDevice_setAntenna(void *dev, const int dir, const size_t chan,
                              const char *name) {
    ((FakeDevice *)dev)->antenna = name;
    return 0;
}

int SoapySDRDevice_setFrequencyCorrection(void *dev, const int dir,
                                          const size_t chan,
                                          const double value) {
    ((FakeDevice *)dev)->correction = value;
    return 0;
}

int SoapySDRDevice_writeSetting(void *dev, const char *key, const char *value) {
    FakeDevice *d = (FakeDevice *)dev;
    if (!d->reject.empty() && d->reject == key) {
        set_error("fake: setting rejected");
        return -5;
    }
    if (strcmp(key, "fake_overflow") == 0) {
        d->overflow_budget = atoi(value);
        return 0;
    }
    d->settings[key] = value;
    return 0;
}

char *SoapySDRDevice_readSetting(const void *dev, const char *key) {
    const FakeDevice *d = (const FakeDevice *)dev;
    if (!d->reject.empty() && d->reject == key) {
        set_error("fake: setting rejected");
        return nullptr;
    }
    auto it = d->settings.find(key);
    if (it == d->settings.end()) return nullptr;
    return strdup(it->second.c_str());
}

static bool format_ok(FakeDevice *d, const char *format) {
    // CS16 always supported; plus the query-declared native format
    // (real drivers advertise a format set; rx_sdr -I requests one,
    // rtl_sdr.c:301)
    if (strcmp(format, "CS16") == 0) return true;
    std::string native = query_val(d->query, "native");
    return !native.empty() && native == format;
}

#ifdef OLD_ABI
int SoapySDRDevice_setupStream(void *dev, void **stream, const int dir,
                               const char *format, const size_t *channels,
                               const size_t numChans, const void *args) {
    if (!format_ok((FakeDevice *)dev, format)) {
        set_error("fake: unsupported format");
        return -5;
    }
    FakeStream *s = new FakeStream();
    s->dev = (FakeDevice *)dev;
    s->format = format;
    *stream = s;
    return 0;
}
#else
void *SoapySDRDevice_setupStream(void *dev, const int dir, const char *format,
                                 const size_t *channels, const size_t numChans,
                                 const void *args) {
    if (!format_ok((FakeDevice *)dev, format)) {
        set_error("fake: unsupported format");
        return nullptr;
    }
    FakeStream *s = new FakeStream();
    s->dev = (FakeDevice *)dev;
    s->format = format;
    return s;
}
#endif

int SoapySDRDevice_activateStream(void *dev, void *stream, const int flags,
                                  const long long timeNs, const size_t numElems) {
    ((FakeDevice *)dev)->activated = 1;
    // drivers chatter on stdout during activation (the reason for the
    // suppress_stdout contract) — emulate it
    printf("fake driver: stream activated\n");
    fflush(stdout);
    return 0;
}

int SoapySDRDevice_deactivateStream(void *dev, void *stream, const int flags,
                                    const long long timeNs) {
    ((FakeDevice *)dev)->activated = 0;
    return 0;
}

int SoapySDRDevice_closeStream(void *dev, void *stream) {
    delete (FakeStream *)stream;
    return 0;
}

int SoapySDRDevice_readStream(void *dev, void *stream, void *const *buffs,
                              const size_t numElems, int *flags,
                              long long *timeNs, const long timeoutUs) {
    FakeDevice *d = (FakeDevice *)dev;
    if (!d->activated) {
        set_error("fake: stream not active");
        return -1;  // TIMEOUT
    }
    if (d->overflow_budget > 0) {
        d->overflow_budget--;
        return -4;  // OVERFLOW
    }
    // deterministic ramp keyed on the absolute sample counter so tests can
    // verify sample continuity across reads; served in the stream's wire
    // format (the rx_sdr -I hardware path, rtl_sdr.c:348-391)
    FakeStream *s = (FakeStream *)stream;
    const std::string &fmt = s ? s->format : "CS16";
    if (fmt == "CS12") {
        uint8_t *out = (uint8_t *)buffs[0];
        for (size_t i = 0; i < numElems; ++i) {
            long long k = d->sample_counter + (long long)i;
            unsigned i12 = (unsigned)(k & 0xFFF);
            unsigned q12 = (unsigned)((~k) & 0xFFF);
            out[3 * i + 0] = (uint8_t)(i12 & 0xFF);
            out[3 * i + 1] = (uint8_t)(((i12 >> 8) & 0x0F)
                                       | ((q12 & 0x0F) << 4));
            out[3 * i + 2] = (uint8_t)((q12 >> 4) & 0xFF);
        }
    } else if (fmt == "CU8") {
        uint8_t *out = (uint8_t *)buffs[0];
        for (size_t i = 0; i < numElems; ++i) {
            long long k = d->sample_counter + (long long)i;
            out[2 * i] = (uint8_t)(k & 0xFF);
            out[2 * i + 1] = (uint8_t)(255 - (k & 0xFF));
        }
    } else if (fmt == "CS8") {
        int8_t *out = (int8_t *)buffs[0];
        for (size_t i = 0; i < numElems; ++i) {
            long long k = d->sample_counter + (long long)i;
            out[2 * i] = (int8_t)(k % 127);
            out[2 * i + 1] = (int8_t)(-(k % 127));
        }
    } else if (fmt == "CF32") {
        float *out = (float *)buffs[0];
        for (size_t i = 0; i < numElems; ++i) {
            long long k = d->sample_counter + (long long)i;
            out[2 * i] = (float)(k % 4096) / 32767.0f;
            out[2 * i + 1] = -(float)(k % 4096) / 32767.0f;
        }
    } else {
        int16_t *out = (int16_t *)buffs[0];
        for (size_t i = 0; i < numElems; ++i) {
            long long k = d->sample_counter + (long long)i;
            out[2 * i] = (int16_t)(k % 4096);
            out[2 * i + 1] = (int16_t)(-(k % 4096));
        }
    }
    d->sample_counter += (long long)numElems;
    *flags = 0;
    *timeNs = d->sample_counter;
    return (int)numElems;
}

}  // extern "C"
